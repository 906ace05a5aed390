/*
 * JVM-native SBS-1 multi-receiver streaming source (VERDICT r11 ask #1:
 * "move framing below Python").
 *
 * This is the same design as the Python partitioned reader in
 * dump1090_stream_parser_spark/sources/sbs1_source.py -- one drain
 * thread per receiver (connect with retry/backoff, recv into a
 * partial-line carry, frame on '\n', stamp receive time, blob-
 * granularity replay buffer with BACKPRESSURE instead of eviction,
 * per-receiver line-count offsets, data-bearing partitions split to
 * rows_per_partition lines/task) -- but implemented against Spark's
 * Java DataSource V2 API so that
 *
 *   (a) framing runs on plain JVM threads: N receivers genuinely
 *       drain in parallel (the Python source's measured ~300k rows/s
 *       one-box ceiling is the driver-process GIL serializing every
 *       drain thread's framing + offset bookkeeping), and
 *   (b) partitions carry a handful of large byte[] blobs through Java
 *       serialization (fast, size-proportional) instead of per-row
 *       payloads -- the builtin TextSocket source ships each buffered
 *       row through the task closure, measured at ~56k rows/s of
 *       addBatch serialization on this box, which is WHY a custom
 *       source exists instead of a socket-source union.
 *
 * Semantics mirror the Python source exactly: per-row receive
 * timestamps, exactly-once into the batch (planned ranges re-read
 * from the replay buffer on task retry), commit() prunes below the
 * checkpointed offset, restart-ahead-of-history fast-forwards
 * (ephemeral TCP cannot replay a gap -- identical to the reference's
 * reconnect semantics and the Python source's documented contract).
 */
package sbs1;

import java.io.ByteArrayOutputStream;
import java.io.IOException;
import java.io.InputStream;
import java.io.Serializable;
import java.net.InetSocketAddress;
import java.net.Socket;
import java.net.SocketTimeoutException;
import java.util.ArrayDeque;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.Set;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableProvider;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream;
import org.apache.spark.sql.connector.read.streaming.Offset;
import org.apache.spark.sql.sources.DataSourceRegister;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.unsafe.types.UTF8String;

public class Sbs1JvmSource implements TableProvider, DataSourceRegister {

  static final StructType SCHEMA =
      new StructType()
          .add("value", DataTypes.StringType)
          .add("ingest_ts", DataTypes.TimestampType);

  @Override
  public String shortName() {
    return "sbs1-jvm";
  }

  @Override
  public StructType inferSchema(CaseInsensitiveStringMap options) {
    return SCHEMA;
  }

  @Override
  public Table getTable(
      StructType schema, Transform[] partitioning, Map<String, String> properties) {
    return new Sbs1Table(properties);
  }

  // ------------------------------------------------------------------
  // Table / Scan plumbing
  // ------------------------------------------------------------------

  static class Sbs1Table implements Table, SupportsRead {
    private final Map<String, String> options;

    Sbs1Table(Map<String, String> options) {
      this.options = options;
    }

    @Override
    public String name() {
      return "sbs1-jvm(" + options.getOrDefault("hosts", "") + ")";
    }

    @Override
    public StructType schema() {
      return SCHEMA;
    }

    @Override
    public Set<TableCapability> capabilities() {
      return new HashSet<>(Arrays.asList(TableCapability.MICRO_BATCH_READ));
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap scanOptions) {
      return () ->
          new Scan() {
            @Override
            public StructType readSchema() {
              return SCHEMA;
            }

            @Override
            public MicroBatchStream toMicroBatchStream(String checkpointLocation) {
              return new Sbs1Stream(scanOptions);
            }
          };
    }
  }

  // ------------------------------------------------------------------
  // Offsets: per-receiver cumulative line counts, {"r0":n0,"r1":n1}
  // ------------------------------------------------------------------

  public static class Sbs1Offset extends Offset {
    final long[] counts;

    Sbs1Offset(long[] counts) {
      this.counts = counts;
    }

    @Override
    public String json() {
      StringBuilder sb = new StringBuilder("{");
      for (int i = 0; i < counts.length; i++) {
        if (i > 0) sb.append(',');
        sb.append("\"r").append(i).append("\":").append(counts[i]);
      }
      return sb.append('}').toString();
    }

    public static Sbs1Offset fromJson(String json, int n) {
      long[] counts = new long[n];
      // flat {"rK":vK,...} -- no nesting, no strings beyond keys
      String body = json.trim();
      body = body.substring(1, body.length() - 1); // strip { }
      int seen = 0;
      if (!body.isEmpty()) {
        for (String kv : body.split(",")) {
          String[] parts = kv.split(":");
          int idx = Integer.parseInt(parts[0].replaceAll("[^0-9]", ""));
          // A checkpointed offset whose receiver set disagrees with the
          // configured hosts must fail fast (the Kafka partition-set
          // rule): silently dropping idx >= n offsets or zero-filling
          // missing ones would lose or invent per-receiver progress on
          // a hosts-list change against an existing checkpoint.
          if (idx >= n) {
            throw new IllegalStateException(
                "checkpointed SBS-1 offset has receiver index " + idx
                    + " but the query is configured with " + n
                    + " host(s); the hosts list cannot change against an"
                    + " existing checkpoint -- start a fresh checkpoint"
                    + " for the new receiver set");
          }
          counts[idx] = Long.parseLong(parts[1].trim());
          seen++;
        }
      }
      if (seen != n) {
        throw new IllegalStateException(
            "checkpointed SBS-1 offset carries " + seen
                + " receiver(s) but the query is configured with " + n
                + " host(s); the hosts list cannot change against an"
                + " existing checkpoint -- start a fresh checkpoint for"
                + " the new receiver set");
      }
      return new Sbs1Offset(counts);
    }
  }

  // ------------------------------------------------------------------
  // Receiver drain thread: the Python _ReceiverThread, in Java
  // ------------------------------------------------------------------

  static class Receiver extends Thread {
    final String host;
    final int port;
    final int bufferSize;
    final int attemptLimit;
    final long attemptDelayMs;
    final long replayCapacity;

    // blob-granularity replay buffer: (firstLine, nLines, blob, tsMicros)
    static class Chunk {
      final long firstLine;
      final int nLines;
      final byte[] blob;
      final long tsMicros;

      Chunk(long firstLine, int nLines, byte[] blob, long tsMicros) {
        this.firstLine = firstLine;
        this.nLines = nLines;
        this.blob = blob;
        this.tsMicros = tsMicros;
      }
    }

    private final ArrayDeque<Chunk> buffer = new ArrayDeque<>();
    private long bufferedLines = 0;
    private long count = 0; // cumulative framed lines == offset
    private volatile boolean stopped = false;
    volatile Exception error = null;
    private byte[] carry = new byte[0];

    Receiver(
        String host,
        int port,
        int bufferSize,
        int attemptLimit,
        long attemptDelayMs,
        long replayCapacity) {
      this.host = host;
      this.port = port;
      this.bufferSize = bufferSize;
      this.attemptLimit = attemptLimit;
      this.attemptDelayMs = attemptDelayMs;
      this.replayCapacity = replayCapacity;
      setDaemon(true);
      setName("sbs1-jvm-recv-" + host + ":" + port);
    }

    @Override
    public void run() {
      Socket sock = null;
      InputStream in = null;
      int attempts = 0;
      byte[] buf = new byte[bufferSize];
      while (!stopped) {
        if (sock == null) {
          try {
            sock = new Socket();
            sock.connect(new InetSocketAddress(host, port), (int) attemptDelayMs);
            sock.setSoTimeout(200);
            in = sock.getInputStream();
            attempts = 0;
          } catch (IOException e) {
            closeQuietly(sock);
            sock = null;
            attempts++;
            if (attempts >= attemptLimit) {
              error =
                  new IOException(
                      "sbs1-jvm: gave up connecting to "
                          + host
                          + ":"
                          + port
                          + " after "
                          + attempts
                          + " attempts",
                      e);
              return;
            }
            sleepQuietly(attemptDelayMs);
            continue;
          }
        }
        boolean full;
        synchronized (this) {
          full = bufferedLines >= replayCapacity;
        }
        if (full) {
          // BACKPRESSURE, not eviction: pause reads and let TCP
          // flow-control the sender (the Python source's measured
          // rule -- eviction dropped 10% of an 8M-row run).
          sleepQuietly(50);
          continue;
        }
        int got;
        try {
          got = in.read(buf);
        } catch (SocketTimeoutException e) {
          continue;
        } catch (IOException e) {
          got = -1;
        }
        if (got < 0) {
          // dead connection -> reconnect (Appendix A L98 semantics)
          closeQuietly(sock);
          sock = null;
          in = null;
          continue;
        }
        if (got == 0) continue;
        byte[] combined = new byte[carry.length + got];
        System.arraycopy(carry, 0, combined, 0, carry.length);
        System.arraycopy(buf, 0, combined, carry.length, got);
        int cut = lastIndexOf(combined, (byte) '\n');
        if (cut < 0) {
          carry = combined;
          continue;
        }
        byte[] blob = Arrays.copyOfRange(combined, 0, cut);
        carry = Arrays.copyOfRange(combined, cut + 1, combined.length);
        int n = countNewlines(blob) + 1;
        long ts = System.currentTimeMillis() * 1000L;
        synchronized (this) {
          buffer.addLast(new Chunk(count, n, blob, ts));
          count += n;
          bufferedLines += n;
        }
      }
      closeQuietly(sock);
    }

    void shutdown() {
      stopped = true;
    }

    synchronized long snapshotCount() {
      return count;
    }

    /** Blob slices covering [lo, hi): interior chunks zero-copy, the
     * two boundary chunks pay one byte-scan slice each. */
    synchronized List<BlobChunk> chunksBetween(long lo, long hi) {
      List<BlobChunk> out = new ArrayList<>();
      for (Chunk c : buffer) {
        long end = c.firstLine + c.nLines;
        if (end <= lo || c.firstLine >= hi) continue;
        int a = (int) Math.max(0, lo - c.firstLine);
        int b = (int) Math.min(c.nLines, hi - c.firstLine);
        if (a == 0 && b == c.nLines) {
          out.add(new BlobChunk(c.blob, c.tsMicros));
        } else {
          out.add(new BlobChunk(sliceLines(c.blob, a, b), c.tsMicros));
        }
      }
      return out;
    }

    synchronized void pruneBelow(long lineNo) {
      while (!buffer.isEmpty()) {
        Chunk c = buffer.peekFirst();
        if (c.firstLine + c.nLines <= lineNo) {
          buffer.pollFirst();
          bufferedLines -= c.nLines;
        } else {
          break;
        }
      }
    }

    /** Restart-from-checkpoint beyond our history: ephemeral TCP cannot
     * replay, so jump the counter and drop stale buffer. */
    synchronized void fastForward(long lineNo) {
      if (lineNo > count) {
        count = lineNo;
        buffer.clear();
        bufferedLines = 0;
      }
    }

    private boolean synced = false;

    /** First-offset sync after (re)start: renumber this FRESH
     * connection's lines to begin at the checkpoint's frontier. The
     * old guard (fastForward only when lo > count) failed whenever the
     * fresh connection out-framed the checkpointed offset during
     * recovery: new-stream lines then replayed AS the pending batch
     * (mislabeled content under an exactly-once contract) and the
     * lines below the offset were silently dropped. Rebasing shifts
     * every buffered line by the checkpoint frontier instead: the
     * replayed range reads EMPTY (loss across the restart gap is the
     * documented ephemeral-TCP contract -- these are lines the OLD
     * connection's offsets covered), and every line the NEW connection
     * framed is preserved and numbered after it. No-op after the first
     * external offset and for fresh queries (synced at latestOffset,
     * before any checkpointed offset exists). */
    synchronized void rebase(long lineNo) {
      if (synced) return;
      synced = true;
      if (lineNo <= 0) return;
      ArrayDeque<Chunk> shifted = new ArrayDeque<>();
      for (Chunk c : buffer) {
        shifted.addLast(new Chunk(c.firstLine + lineNo, c.nLines, c.blob, c.tsMicros));
      }
      buffer.clear();
      buffer.addAll(shifted);
      count += lineNo;
    }

    synchronized void markSynced() {
      synced = true;
    }

    // -- byte helpers ---------------------------------------------------

    static int lastIndexOf(byte[] a, byte b) {
      for (int i = a.length - 1; i >= 0; i--) {
        if (a[i] == b) return i;
      }
      return -1;
    }

    static int countNewlines(byte[] a) {
      int n = 0;
      for (byte x : a) {
        if (x == '\n') n++;
      }
      return n;
    }

    /** Lines [a, b) of a framed blob (blob holds nLines lines with
     * n-1 interior newlines). */
    static byte[] sliceLines(byte[] blob, int a, int b) {
      int start = 0;
      int seen = 0;
      while (seen < a) {
        while (blob[start] != '\n') start++;
        start++;
        seen++;
      }
      int end = start;
      int want = b - a; // lines to take
      int taken = 0;
      while (end < blob.length && taken < want) {
        if (blob[end] == '\n') taken++;
        end++;
      }
      if (taken < want) end = blob.length; // last line has no trailing \n
      else end--; // drop the trailing separator
      return Arrays.copyOfRange(blob, start, end);
    }

    static void closeQuietly(Socket s) {
      if (s != null) {
        try {
          s.close();
        } catch (IOException ignored) {
        }
      }
    }

    static void sleepQuietly(long ms) {
      try {
        Thread.sleep(ms);
      } catch (InterruptedException ignored) {
      }
    }
  }

  // ------------------------------------------------------------------
  // Partition payload: a handful of large byte[] blobs (fast to
  // Java-serialize), split + decoded executor-side.
  // ------------------------------------------------------------------

  static class BlobChunk implements Serializable {
    final byte[] data;
    final long tsMicros;

    BlobChunk(byte[] data, long tsMicros) {
      this.data = data;
      this.tsMicros = tsMicros;
    }
  }

  static class Sbs1Partition implements InputPartition {
    final List<BlobChunk> chunks;

    Sbs1Partition(List<BlobChunk> chunks) {
      this.chunks = chunks;
    }
  }

  // ------------------------------------------------------------------
  // MicroBatchStream
  // ------------------------------------------------------------------

  static class Sbs1Stream implements MicroBatchStream {
    private final String[] hostsSpec;
    private final int bufferSize;
    private final int attemptLimit;
    private final long attemptDelayMs;
    private final long replayCapacity;
    private final long maxLinesPerBatch;
    private final int rowsPerPartition;
    private Receiver[] receivers = null;
    private long[] planned;

    Sbs1Stream(CaseInsensitiveStringMap options) {
      String hosts = options.get("hosts");
      if (hosts == null || hosts.trim().isEmpty()) {
        throw new IllegalArgumentException("sbs1-jvm needs hosts=h1:p1[,h2:p2,...]");
      }
      this.hostsSpec = hosts.split(",");
      this.bufferSize = options.getInt("buffer_size", 65536);
      this.attemptLimit = options.getInt("connect_attempt_limit", 10);
      this.attemptDelayMs = (long) (options.getDouble("connect_attempt_delay", 5.0) * 1000);
      this.replayCapacity = options.getLong("replay_capacity", 1_000_000L);
      this.maxLinesPerBatch = options.getLong("max_lines_per_batch", 1_000_000L);
      this.rowsPerPartition = options.getInt("rows_per_partition", 65536);
      this.planned = new long[hostsSpec.length];
    }

    private synchronized Receiver[] ensureStarted() {
      if (receivers == null) {
        receivers = new Receiver[hostsSpec.length];
        for (int i = 0; i < hostsSpec.length; i++) {
          String spec = hostsSpec[i].trim();
          int colon = spec.lastIndexOf(':');
          String host = colon < 0 ? spec : spec.substring(0, colon);
          int port = colon < 0 ? 30003 : Integer.parseInt(spec.substring(colon + 1));
          receivers[i] =
              new Receiver(host, port, bufferSize, attemptLimit, attemptDelayMs, replayCapacity);
          receivers[i].start();
        }
      }
      return receivers;
    }

    private void checkErrors() {
      for (Receiver r : ensureStarted()) {
        if (r.error != null) {
          throw new RuntimeException(r.error);
        }
      }
    }

    @Override
    public Offset initialOffset() {
      return new Sbs1Offset(new long[hostsSpec.length]);
    }

    @Override
    public Offset latestOffset() {
      Receiver[] rs = ensureStarted();
      checkErrors();
      long[] out = new long[rs.length];
      for (int i = 0; i < rs.length; i++) {
        // fresh-query path: no checkpointed offset will ever arrive,
        // so numbering starts at 0 (no-op if a restart's
        // planInputPartitions/commit rebased first)
        rs[i].markSynced();
        long next = Math.min(rs[i].snapshotCount(), planned[i] + maxLinesPerBatch);
        planned[i] = Math.max(planned[i], next);
        out[i] = next;
      }
      return new Sbs1Offset(out);
    }

    @Override
    public Offset deserializeOffset(String json) {
      return Sbs1Offset.fromJson(json, hostsSpec.length);
    }

    @Override
    public InputPartition[] planInputPartitions(Offset start, Offset end) {
      Receiver[] rs = ensureStarted();
      long[] lo = ((Sbs1Offset) start).counts;
      long[] hi = ((Sbs1Offset) end).counts;
      List<InputPartition> parts = new ArrayList<>();
      for (int i = 0; i < rs.length; i++) {
        // restart path: the first planned range is the WAL's pending
        // batch -- rebase the fresh connection's numbering to its END
        // (empty replay, documented loss; fresh lines preserved after)
        rs[i].rebase(hi[i]);
        if (lo[i] > rs[i].snapshotCount()) {
          // defensive: a checkpoint still ahead after rebase
          rs[i].fastForward(lo[i]);
          planned[i] = Math.max(planned[i], lo[i]);
          continue;
        }
        planned[i] = Math.max(planned[i], lo[i]);
        for (long s = lo[i]; s < hi[i]; s += rowsPerPartition) {
          List<BlobChunk> chunks = rs[i].chunksBetween(s, Math.min(s + rowsPerPartition, hi[i]));
          if (!chunks.isEmpty()) {
            parts.add(new Sbs1Partition(chunks));
          }
        }
      }
      return parts.toArray(new InputPartition[0]);
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new Sbs1ReaderFactory();
    }

    @Override
    public void commit(Offset end) {
      long[] counts = ((Sbs1Offset) end).counts;
      Receiver[] rs = ensureStarted();
      for (int i = 0; i < rs.length; i++) {
        // Restart path: when the last batch in the checkpoint was
        // already committed, Spark replays only this commit() -- the
        // fresh connection rebases its numbering to the committed
        // offset so latestOffset() never goes backwards AND every
        // line framed during recovery is preserved (no-op on a live
        // synced receiver).
        rs[i].rebase(counts[i]);
        planned[i] = Math.max(planned[i], counts[i]);
        rs[i].pruneBelow(counts[i]);
      }
    }

    @Override
    public void stop() {
      if (receivers != null) {
        for (Receiver r : receivers) {
          r.shutdown();
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Executor-side reader: split blobs into lines, emit InternalRows.
  // UTF8String.fromBytes points into the blob (no per-line copy).
  // ------------------------------------------------------------------

  static class Sbs1ReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      return new Sbs1PartitionReader((Sbs1Partition) partition);
    }
  }

  static class Sbs1PartitionReader implements PartitionReader<InternalRow> {
    private final List<BlobChunk> chunks;
    private int chunkIdx = 0;
    private int pos = 0;
    private InternalRow current = null;

    Sbs1PartitionReader(Sbs1Partition partition) {
      this.chunks = partition.chunks;
    }

    @Override
    public boolean next() {
      while (chunkIdx < chunks.size()) {
        BlobChunk c = chunks.get(chunkIdx);
        byte[] d = c.data;
        while (pos <= d.length) {
          int start = pos;
          int end = start;
          while (end < d.length && d[end] != '\n') end++;
          pos = end + 1;
          int trimmed = end;
          if (trimmed > start && d[trimmed - 1] == '\r') trimmed--;
          if (trimmed > start) {
            Object[] fields = new Object[2];
            fields[0] = UTF8String.fromBytes(d, start, trimmed - start);
            fields[1] = c.tsMicros;
            current = new GenericInternalRow(fields);
            return true;
          }
          if (end >= d.length) break; // trailing empty: move to next chunk
        }
        chunkIdx++;
        pos = 0;
      }
      return false;
    }

    @Override
    public InternalRow get() {
      return current;
    }

    @Override
    public void close() {}
  }
}
