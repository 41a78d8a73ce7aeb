package it.unimi.dsi.fastutil.ints;
/** Compile shim: only wrap(int[]) is used (over a freshly sorted array). */
public final class IntIterators {
  public static IntIterator wrap(final int[] a) {
    return new AbstractIntIterator() {
      private int i = 0;
      @Override public boolean hasNext() { return i < a.length; }
      @Override public int nextInt() { return a[i++]; }
    };
  }
  private IntIterators() {}
}
