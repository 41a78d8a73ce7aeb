package com.google.protobuf;

import java.util.Arrays;

/** Minimal immutable byte-array holder implementing the published
 * ByteString API subset the reference internals touch. */
public final class ByteString {
  public static final ByteString EMPTY = new ByteString(new byte[0]);
  private final byte[] bytes;

  private ByteString(byte[] bytes) { this.bytes = bytes; }

  public static ByteString copyFrom(byte[] src, int offset, int size) {
    return new ByteString(Arrays.copyOfRange(src, offset, offset + size));
  }

  public static ByteString copyFrom(byte[] src) { return copyFrom(src, 0, src.length); }

  public int size() { return bytes.length; }
  public boolean isEmpty() { return bytes.length == 0; }
  public byte[] toByteArray() { return bytes.clone(); }
}
