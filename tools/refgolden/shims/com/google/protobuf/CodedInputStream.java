package com.google.protobuf;

import java.io.IOException;
import java.nio.ByteBuffer;

/** Varint reader for the published protobuf wire format — the subset the
 * reference's State.parse walks (tags, varints, length-delimited slices). */
public final class CodedInputStream {
  private final byte[] buf;
  private int pos;

  private CodedInputStream(byte[] buf) { this.buf = buf; this.pos = 0; }

  public static CodedInputStream newInstance(byte[] buf) { return new CodedInputStream(buf); }

  public void enableAliasing(boolean enabled) {}

  public boolean isAtEnd() { return pos >= buf.length; }

  public int getTotalBytesRead() { return pos; }

  public int readTag() throws IOException {
    if (isAtEnd()) return 0;
    return (int) readRawVarint64();
  }

  public long readRawVarint64() throws IOException {
    long result = 0;
    for (int shift = 0; shift < 64; shift += 7) {
      if (isAtEnd()) throw new InvalidProtocolBufferException("truncated varint");
      byte b = buf[pos++];
      result |= (long) (b & 0x7F) << shift;
      if ((b & 0x80) == 0) return result;
    }
    throw new InvalidProtocolBufferException("malformed varint");
  }

  public int readInt32() throws IOException { return (int) readRawVarint64(); }
  public long readInt64() throws IOException { return readRawVarint64(); }
  public int readEnum() throws IOException { return (int) readRawVarint64(); }

  public ByteBuffer readByteBuffer() throws IOException {
    int len = readInt32();
    if (len < 0 || pos + len > buf.length) {
      throw new InvalidProtocolBufferException("truncated length-delimited field");
    }
    ByteBuffer out = ByteBuffer.wrap(buf, pos, len).slice();
    pos += len;
    return out;
  }

  public void skipField(int tag) throws IOException {
    switch (tag & 7) {
      case WireFormat.WIRETYPE_VARINT: readRawVarint64(); break;
      case WireFormat.WIRETYPE_FIXED64: pos += 8; break;
      case WireFormat.WIRETYPE_LENGTH_DELIMITED: pos += readInt32(); break;
      case WireFormat.WIRETYPE_FIXED32: pos += 4; break;
      default: throw new InvalidProtocolBufferException("unsupported wire type in tag " + tag);
    }
    if (pos > buf.length) throw new InvalidProtocolBufferException("truncated field");
  }
}
