package com.google.zetasketch;

import com.google.protos.zetasketch.Aggregator.DefaultOpsType;

/**
 * Compile shim replacing the reference's AutoValue-based ValueType (which
 * needs annotation processing + protoc output unavailable offline). For
 * the byte-level golden harness only its integer identity matters: the
 * serialized state stores just getNumber() as varint field 4
 * (State.java:234-237), so this carries no sketch logic.
 */
public final class ValueType {
  public static final ValueType UNKNOWN = new ValueType(0);

  private final int number;

  private ValueType(int number) { this.number = number; }

  public static ValueType forNumber(int number) {
    return number == 0 ? UNKNOWN : new ValueType(number);
  }

  public static ValueType forStandardType(DefaultOpsType.Id id) {
    return forNumber(id.getNumber());
  }

  public int getNumber() { return number; }

  @Override public boolean equals(Object o) {
    return o instanceof ValueType && ((ValueType) o).number == number;
  }

  @Override public int hashCode() { return number; }

  @Override public String toString() { return "ValueType(" + number + ")"; }
}
