package javax.annotation;
/** Compile shim: annotation marker only (JSR-305 is not on this box). */
public @interface Nullable {}
