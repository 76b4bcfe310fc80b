"""Scalar-function surface: hashing, UDF registration shims."""
