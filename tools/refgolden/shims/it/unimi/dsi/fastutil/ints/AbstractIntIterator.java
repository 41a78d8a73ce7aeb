package it.unimi.dsi.fastutil.ints;
/** Compile shim: next() boxes nextInt(), as in fastutil. */
public abstract class AbstractIntIterator implements IntIterator {
  @Override public Integer next() { return nextInt(); }
  @Override public void remove() { throw new UnsupportedOperationException(); }
}
