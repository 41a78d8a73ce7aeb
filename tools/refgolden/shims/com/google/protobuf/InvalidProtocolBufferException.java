package com.google.protobuf;
/** Compile shim. */
public class InvalidProtocolBufferException extends java.io.IOException {
  public InvalidProtocolBufferException(String message) { super(message); }
}
