package it.unimi.dsi.fastutil.ints;
/** Compile shim: the subset of IntCollection SparseRepresentation calls. */
public interface IntCollection {
  boolean add(int v);
  int size();
  boolean isEmpty();
  void clear();
  int[] toIntArray();
  IntIterator iterator();
}
