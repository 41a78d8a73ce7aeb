package com.google.protos.zetasketch;

/**
 * Compile shim standing in for the protoc-generated HLL++ state classes:
 * field numbers transcribed from the reference's proto/hllplus-unique.proto
 * (extension 112 at line 113, state fields 2-6 at lines 42-106).
 */
public final class HllplusUnique {
  public static final int HYPERLOGLOGPLUS_UNIQUE_STATE_FIELD_NUMBER = 112;

  public static final class HyperLogLogPlusUniqueStateProto {
    public static final int SPARSE_SIZE_FIELD_NUMBER = 2;
    public static final int PRECISION_OR_NUM_BUCKETS_FIELD_NUMBER = 3;
    public static final int SPARSE_PRECISION_OR_NUM_BUCKETS_FIELD_NUMBER = 4;
    public static final int DATA_FIELD_NUMBER = 5;
    public static final int SPARSE_DATA_FIELD_NUMBER = 6;
    private HyperLogLogPlusUniqueStateProto() {}
  }

  private HllplusUnique() {}
}
