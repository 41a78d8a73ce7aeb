package it.unimi.dsi.fastutil;
/** Compile shim for the fastutil marker interface. */
public interface Hash {}
