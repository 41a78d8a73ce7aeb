package com.google.protobuf;

import java.io.IOException;
import java.nio.ByteBuffer;

/**
 * Varint writer implementing the published protobuf wire format
 * (https://protobuf.dev/programming-guides/encoding/) for exactly the
 * NoTag write/compute methods that the reference's State.java calls.
 * Semantics match protobuf-java: int32 writes negative values as
 * 10-byte sign-extended varints; uint32 writes the raw bits.
 */
public final class CodedOutputStream {
  private final byte[] buf;
  private int pos;

  private CodedOutputStream(byte[] buf) { this.buf = buf; this.pos = 0; }

  public static CodedOutputStream newInstance(byte[] buf) { return new CodedOutputStream(buf); }

  public void writeUInt32NoTag(int value) throws IOException {
    while ((value & ~0x7F) != 0) {
      buf[pos++] = (byte) ((value & 0x7F) | 0x80);
      value >>>= 7;
    }
    buf[pos++] = (byte) value;
  }

  public void writeUInt64NoTag(long value) throws IOException {
    while ((value & ~0x7FL) != 0) {
      buf[pos++] = (byte) (((int) value & 0x7F) | 0x80);
      value >>>= 7;
    }
    buf[pos++] = (byte) value;
  }

  public void writeInt32NoTag(int value) throws IOException {
    if (value >= 0) {
      writeUInt32NoTag(value);
    } else {
      writeUInt64NoTag(value); // sign-extended 10-byte varint
    }
  }

  public void writeInt64NoTag(long value) throws IOException { writeUInt64NoTag(value); }

  public void writeEnumNoTag(int value) throws IOException { writeInt32NoTag(value); }

  /** Writes the buffer's remaining bytes without altering its position. */
  public void writeLazy(ByteBuffer data) throws IOException {
    ByteBuffer d = data.duplicate();
    int n = d.remaining();
    d.get(buf, pos, n);
    pos += n;
  }

  public void checkNoSpaceLeft() {
    if (pos != buf.length) {
      throw new IllegalStateException(
          "Did not write as much data as expected: " + pos + " vs " + buf.length);
    }
  }

  public static int computeUInt32SizeNoTag(int value) {
    if ((value & (~0 << 7)) == 0) return 1;
    if ((value & (~0 << 14)) == 0) return 2;
    if ((value & (~0 << 21)) == 0) return 3;
    if ((value & (~0 << 28)) == 0) return 4;
    return 5;
  }

  public static int computeUInt64SizeNoTag(long value) {
    int n = 1;
    while ((value & ~0x7FL) != 0) { n++; value >>>= 7; }
    return n;
  }

  public static int computeInt32SizeNoTag(int value) {
    return value >= 0 ? computeUInt32SizeNoTag(value) : 10;
  }

  public static int computeInt64SizeNoTag(long value) { return computeUInt64SizeNoTag(value); }

  public static int computeEnumSizeNoTag(int value) { return computeInt32SizeNoTag(value); }
}
