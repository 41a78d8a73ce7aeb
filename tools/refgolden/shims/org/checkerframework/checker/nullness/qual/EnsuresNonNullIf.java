package org.checkerframework.checker.nullness.qual;
/** Compile shim: checkerframework is a static-analysis-only dependency. */
public @interface EnsuresNonNullIf { String[] expression(); boolean result(); }
