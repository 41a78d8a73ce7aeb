package it.unimi.dsi.fastutil.ints;
/** Compile shim for fastutil's int hash strategy holder. */
public final class IntHash {
  public interface Strategy {
    int hashCode(int e);
    boolean equals(int a, int b);
  }
  private IntHash() {}
}
