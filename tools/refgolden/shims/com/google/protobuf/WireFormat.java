package com.google.protobuf;
/** Compile shim: the public protobuf wire-type constants (wire format is a
 * published spec: https://protobuf.dev/programming-guides/encoding/). */
public final class WireFormat {
  public static final int WIRETYPE_VARINT = 0;
  public static final int WIRETYPE_FIXED64 = 1;
  public static final int WIRETYPE_LENGTH_DELIMITED = 2;
  public static final int WIRETYPE_START_GROUP = 3;
  public static final int WIRETYPE_END_GROUP = 4;
  public static final int WIRETYPE_FIXED32 = 5;
  private WireFormat() {}
}
