package it.unimi.dsi.fastutil.ints;

import java.util.HashSet;
import java.util.Set;

/**
 * Behavioral shim for fastutil's strategy-keyed int set, backed by
 * java.util.HashSet. Set SEMANTICS (dedupe via the strategy) are identical;
 * iteration order may differ from fastutil's, which cannot affect the
 * reference's serialized bytes: SparseRepresentation always sorts the
 * buffer (bufferIterator -> Arrays.sort) before any value reaches the
 * difference encoder, and the one unsorted consumer (mergeInto) feeds
 * NormalRepresentation register maxima, which are order-insensitive.
 */
public class IntOpenCustomHashSet implements IntCollection {
  private final IntHash.Strategy strategy;
  private final Set<Key> set = new HashSet<>();

  private final class Key {
    final int v;
    Key(int v) { this.v = v; }
    @Override public int hashCode() { return strategy.hashCode(v); }
    @Override public boolean equals(Object o) {
      return o instanceof Key && strategy.equals(v, ((Key) o).v);
    }
  }

  public IntOpenCustomHashSet(IntHash.Strategy strategy) { this.strategy = strategy; }

  @Override public boolean add(int v) { return set.add(new Key(v)); }
  @Override public int size() { return set.size(); }
  @Override public boolean isEmpty() { return set.isEmpty(); }
  @Override public void clear() { set.clear(); }

  @Override public int[] toIntArray() {
    int[] out = new int[set.size()];
    int i = 0;
    for (Key k : set) out[i++] = k.v;
    return out;
  }

  @Override public IntIterator iterator() {
    final java.util.Iterator<Key> it = set.iterator();
    return new AbstractIntIterator() {
      @Override public boolean hasNext() { return it.hasNext(); }
      @Override public int nextInt() { return it.next().v; }
    };
  }
}
