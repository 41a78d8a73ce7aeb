package com.google.protos.zetasketch;

/**
 * Compile shim standing in for the protoc-generated aggregator classes:
 * ONLY the enum numbers and field-number constants, transcribed from the
 * reference's own proto/aggregator.proto (field numbers at lines 167-189,
 * AggregatorType at 54-64, DefaultOpsType.Id at 73-137).
 */
public final class Aggregator {

  public enum AggregatorType {
    AGGREGATOR_TYPE_UNSPECIFIED(0),
    SUM(100),
    HYPERLOGLOG_PLUS_UNIQUE(112);

    private final int number;
    AggregatorType(int number) { this.number = number; }
    public int getNumber() { return number; }

    public static AggregatorType forNumber(int number) {
      for (AggregatorType t : values()) {
        if (t.number == number) return t;
      }
      return null;
    }
  }

  public static final class AggregatorStateProto {
    public static final int TYPE_FIELD_NUMBER = 1;
    public static final int NUM_VALUES_FIELD_NUMBER = 2;
    public static final int ENCODING_VERSION_FIELD_NUMBER = 3;
    public static final int VALUE_TYPE_FIELD_NUMBER = 4;
    private AggregatorStateProto() {}
  }

  public static final class DefaultOpsType {
    public enum Id {
      UNKNOWN(0), INT8(1), INT16(2), INT32(3), INT64(4), UINT8(5), UINT16(6),
      UINT32(7), UINT64(8), FLOAT(9), DOUBLE(10), BYTES_OR_UTF8_STRING(11);

      private final int number;
      Id(int number) { this.number = number; }
      public int getNumber() { return number; }
    }
    private DefaultOpsType() {}
  }

  private Aggregator() {}
}
