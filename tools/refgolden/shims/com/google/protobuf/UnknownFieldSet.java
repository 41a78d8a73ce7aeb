package com.google.protobuf;

import java.io.IOException;

/** Compile shim: the reference only uses this to skip unknown fields. */
public final class UnknownFieldSet {
  public static Builder newBuilder() { return new Builder(); }

  public static final class Builder {
    public Builder mergeFieldFrom(int tag, CodedInputStream input) throws IOException {
      input.skipField(tag);
      return this;
    }
  }

  private UnknownFieldSet() {}
}
