import com.google.common.hash.Hashing;
import java.nio.charset.StandardCharsets;

/** Generates golden fingerprint2011 vectors (deterministic byte patterns) as TSV. */
public class GenHashGolden {
  public static void main(String[] args) {
    // deterministic pattern bytes: b[i] = (i*131 + 7) & 0xff
    int[] lens = {0,1,2,3,4,5,6,7,8,9,15,16,17,23,24,25,31,32,33,40,47,48,55,63,64,65,80,100,127,128,129,200,255,256,1000,4096};
    for (int len : lens) {
      byte[] b = new byte[len];
      for (int i = 0; i < len; i++) b[i] = (byte) ((i * 131 + 7) & 0xff);
      long h = Hashing.fingerprint2011().hashBytes(b).asLong();
      System.out.println("bytes\t" + len + "\t" + Long.toUnsignedString(h));
    }
    long[] longs = {0L, 1L, -1L, 42L, -15L, Long.MAX_VALUE, Long.MIN_VALUE, 123456789012345L};
    for (long v : longs) {
      System.out.println("long\t" + v + "\t" + Long.toUnsignedString(Hashing.fingerprint2011().hashLong(v).asLong()));
    }
    int[] ints = {0, 1, -1, 42, -15, Integer.MAX_VALUE, Integer.MIN_VALUE};
    for (int v : ints) {
      System.out.println("int\t" + v + "\t" + Long.toUnsignedString(Hashing.fingerprint2011().hashInt(v).asLong()));
    }
    String[] strs = {"", "foo", "foobar", "Zürich", "Zürich", "the quick brown fox jumps over the lazy dog repeatedly and then some more text to cross 64 bytes"};
    for (String s : strs) {
      System.out.println("str\t" + s + "\t" + Long.toUnsignedString(Hashing.fingerprint2011().hashString(s, StandardCharsets.UTF_8).asLong()));
    }
  }
}
