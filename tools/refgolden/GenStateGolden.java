import com.google.protos.zetasketch.Aggregator.AggregatorType;
import com.google.zetasketch.ValueType;
import com.google.zetasketch.internal.hash.Hash;
import com.google.zetasketch.internal.hllplus.Representation;
import com.google.zetasketch.internal.hllplus.State;

/**
 * Golden-state generator: drives the REFERENCE implementation's own
 * representations (State / SparseRepresentation / NormalRepresentation /
 * Encoding, compiled unmodified from /root/reference) over deterministic
 * value streams and dumps the serialized AggregatorStateProto bytes as hex.
 *
 * The add/merge/serialize orchestration below replicates
 * HyperLogLogPlusPlus.java exactly: addHash at 216-218 (representation =
 * representation.addHash(hash); state.numValues++), merge at 267-268
 * (representation.merge(other.representation); numValues +=), serialize at
 * 297-299 (representation = representation.compact(); state.toByteArray()).
 * Builder defaults at 420-441 (encodingVersion=2, type, valueType).
 */
public class GenStateGolden {

  static final class Agg {
    final State state = new State();
    Representation rep;
    final String spec;

    Agg(int p, int sp, int vt, String spec) {
      state.type = AggregatorType.HYPERLOGLOG_PLUS_UNIQUE;
      state.encodingVersion = 2;
      state.precision = p;
      state.sparsePrecision = sp;
      state.valueType = ValueType.forNumber(vt);
      rep = Representation.fromState(state);
      this.spec = spec;
    }

    void add(long hash) {
      rep = rep.addHash(hash);
      state.numValues++;
    }

    void merge(Agg other) {
      rep = rep.merge(other.rep);
      state.numValues += other.state.numValues;
    }

    String hex() {
      rep = rep.compact();
      byte[] b = state.toByteArray();
      StringBuilder sb = new StringBuilder(b.length * 2);
      for (byte x : b) sb.append(String.format("%02x", x));
      return sb.toString();
    }
  }

  static Agg longs(int p, int sp, long seed, int n) {
    Agg a = new Agg(p, sp, 8, "long:" + seed + ":" + n + ":" + p + ":" + sp);
    for (int i = 0; i < n; i++) a.add(Hash.of(seed + i));
    return a;
  }

  static Agg strings(int p, int sp, String prefix, int n) {
    Agg a = new Agg(p, sp, 11, "str:" + prefix + ":" + n + ":" + p + ":" + sp);
    for (int i = 0; i < n; i++) a.add(Hash.of(prefix + i));
    return a;
  }

  static Agg ints(int p, int sp, int seed, int n) {
    Agg a = new Agg(p, sp, 7, "int:" + seed + ":" + n + ":" + p + ":" + sp);
    for (int i = 0; i < n; i++) a.add(Hash.of(seed + i));
    return a;
  }

  static void emit(String name, Agg a) {
    System.out.println(name + "\t" + a.state.precision + "\t" + a.state.sparsePrecision
        + "\t" + a.state.valueType.getNumber() + "\t" + a.spec + "\t" + a.hex());
  }

  static void emitMerged(String name, Agg a, Agg b) {
    // Merge COMPACTED states: replicates the distributed reality where
    // merges operate on serialized protos (HyperLogLogPlusPlus.forProto ->
    // merge), whose sparse data is always flushed. Merging an in-memory
    // sparse representation with a non-empty temporary buffer into a
    // LOWER-precision sparse one hits a reference bug: downgrade()
    // (SparseRepresentation.java:222) re-adds the buffered values without
    // re-encoding them to the target precision, corrupting the state.
    a.rep = a.rep.compact();
    b.rep = b.rep.compact();
    a.merge(b);
    System.out.println(name + "\t" + a.state.precision + "\t" + a.state.sparsePrecision
        + "\t" + a.state.valueType.getNumber() + "\t" + a.spec + "|" + b.spec + "\t" + a.hex());
  }

  public static void main(String[] args) {
    // single-stream states: sparse, around the upgrade boundary, dense
    int[][] pn = {
      {10, 13, 100}, {10, 13, 700}, {10, 13, 2000}, {10, 13, 10000},
      {13, 16, 10}, {13, 16, 500}, {13, 16, 2500}, {13, 16, 3000}, {13, 16, 50000},
      {15, 25, 3}, {15, 25, 1000}, {15, 25, 6000}, {15, 25, 8000}, {15, 25, 100000},
      {20, 25, 1000}, {20, 25, 50000},
      // maximum normal precision (north_rule: precisions 10-24). Sparse
      // states only: a dense p=24 proto is 16 MiB of registers — the
      // sparse encodings and the downgrade path are what is p-specific
      {24, 25, 100}, {24, 25, 5000},
    };
    for (int[] c : pn) {
      emit("longs_p" + c[0] + "_sp" + c[1] + "_n" + c[2], longs(c[0], c[1], 1000, c[2]));
    }
    emit("longs_p15_nosparse_n1000", longs(15, 0, 1000, 1000));
    emit("strings_p15_sp25_n100", strings(15, 25, "item-", 100));
    emit("strings_p15_sp25_n5000", strings(15, 25, "item-", 5000));
    emit("ints_p15_sp25_n1000", ints(15, 25, 17, 1000));

    // merges: same-precision sparse/normal, upgrade-during-merge, and
    // cross-precision downgrades in both directions
    emitMerged("merge_sparse_sparse_p13", longs(13, 16, 1, 200), longs(13, 16, 100, 200));
    emitMerged("merge_sparse_upgrade_p13", longs(13, 16, 1, 2000), longs(13, 16, 1500, 2000));
    emitMerged("merge_normal_normal_p13", longs(13, 16, 1, 50000), longs(13, 16, 30000, 30000));
    emitMerged("merge_downgrade_n15_n13", longs(15, 25, 1, 100000), longs(13, 16, 50000, 50000));
    emitMerged("merge_downgrade_n13_n15", longs(13, 16, 50000, 50000), longs(15, 25, 1, 100000));
    emitMerged("merge_sparse_downgrade_s15_s13", longs(15, 25, 1, 500), longs(13, 16, 300, 300));
    emitMerged("merge_normal_sparse_p13", longs(13, 16, 1, 50000), longs(13, 16, 100, 500));
    emitMerged("merge_sparse_normal_p13", longs(13, 16, 100, 500), longs(13, 16, 1, 50000));
    // sparse-precision-ONLY downgrades (same p, different sp) — the
    // NormalRepresentationTest merge_DowngradesSparsePrecision shape
    emitMerged("merge_sp_only_s13sp18_s13sp16", longs(13, 18, 1, 400), longs(13, 16, 200, 400));
    emitMerged("merge_sp_only_s13sp16_s13sp18", longs(13, 16, 200, 400), longs(13, 18, 1, 400));
    emitMerged("merge_sp_only_n15sp25_s15sp20", longs(15, 25, 1, 100000), longs(15, 20, 50, 800));
    emitMerged("merge_sparse_downgrade_s24_s20", longs(24, 25, 1, 2000), longs(20, 25, 1000, 2000));
  }
}
