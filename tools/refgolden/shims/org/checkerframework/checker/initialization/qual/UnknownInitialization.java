package org.checkerframework.checker.initialization.qual;

import java.lang.annotation.ElementType;
import java.lang.annotation.Target;

/** Compile shim: checkerframework is a static-analysis-only dependency. */
@Target({ElementType.TYPE_USE, ElementType.TYPE_PARAMETER})
public @interface UnknownInitialization { Class<?> value() default Object.class; }
