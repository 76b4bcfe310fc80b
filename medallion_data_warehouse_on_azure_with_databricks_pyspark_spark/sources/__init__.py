"""Sources & sinks: batch/streaming readers, atomic writers, catalog DDL."""
