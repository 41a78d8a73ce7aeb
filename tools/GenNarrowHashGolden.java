import com.google.common.hash.Hashing;

/**
 * Golden fingerprint2011 vectors for the narrow fixed-width hash recipes of
 * proto/aggregator.proto:77-120 (DefaultOpsType INT8/UINT8 = single
 * 2s-complement byte; INT16/UINT16 = two little-endian bytes; UINT32/UINT64
 * share the INT32/INT64 byte recipes). Guava's public fingerprint2011 over
 * the proto-specified byte strings IS the reference hash (Hash.java:32-50
 * delegates to it), so hashBytes on hand-built buffers gives the oracle.
 */
public class GenNarrowHashGolden {
  public static void main(String[] args) {
    int[] b1 = {0, 1, -1, 42, 127, -128, -15, 100};
    for (int v : b1) {
      byte[] buf = {(byte) v};
      long h = Hashing.fingerprint2011().hashBytes(buf).asLong();
      System.out.println("int8\t" + v + "\t" + Long.toUnsignedString(h));
    }
    int[] b2 = {0, 1, -1, 42, 127, -128, 128, 255, 256, 12345, -12345, 32767, -32768};
    for (int v : b2) {
      byte[] buf = {(byte) (v & 0xff), (byte) ((v >> 8) & 0xff)};
      long h = Hashing.fingerprint2011().hashBytes(buf).asLong();
      System.out.println("int16\t" + v + "\t" + Long.toUnsignedString(h));
    }
  }
}
