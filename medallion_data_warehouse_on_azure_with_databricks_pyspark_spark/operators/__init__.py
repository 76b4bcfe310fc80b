"""Relational + extension operators, all ``DataFrame -> DataFrame``."""
