import com.google.common.hash.Hashing;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;

/**
 * Golden fingerprint2011 vectors for the FLOAT/DOUBLE hash recipes of
 * the reference wire spec (proto/aggregator.proto DefaultOpsType.Id
 * FLOAT=9 / DOUBLE=10: fingerprint2011 of the 4/8 little-endian IEEE754
 * bytes). Generated with Guava's fingerprint2011 - the same function the
 * reference delegates to (internal/hash/Hash.java:19).
 */
public class GenFloatHashGolden {
  public static void main(String[] args) {
    double[] ds = {0.0, -0.0, 1.0, -1.0, 0.5, 3.141592653589793, -2.718281828459045,
                   1e-300, 1e300, Double.MAX_VALUE, Double.MIN_VALUE,
                   Double.POSITIVE_INFINITY, Double.NEGATIVE_INFINITY, 42.0, 123456.789};
    for (double v : ds) {
      byte[] b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array();
      System.out.println("double\t" + Double.toString(v) + "\t"
          + Long.toUnsignedString(Hashing.fingerprint2011().hashBytes(b).asLong()));
    }
    float[] fs = {0.0f, -0.0f, 1.0f, -1.0f, 0.5f, 3.1415927f, -2.7182817f,
                  1e-30f, 1e30f, Float.MAX_VALUE, Float.MIN_VALUE,
                  Float.POSITIVE_INFINITY, Float.NEGATIVE_INFINITY, 42.0f, 123456.79f};
    for (float v : fs) {
      byte[] b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(v).array();
      System.out.println("float\t" + Float.toString(v) + "\t"
          + Long.toUnsignedString(Hashing.fingerprint2011().hashBytes(b).asLong()));
    }
  }
}
