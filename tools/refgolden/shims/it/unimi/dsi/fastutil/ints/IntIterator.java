package it.unimi.dsi.fastutil.ints;
/** Compile shim matching the fastutil IntIterator surface the reference uses. */
public interface IntIterator extends java.util.Iterator<Integer> {
  int nextInt();
}
