"""Sources & sinks: batch readers, partitioned writers, CDC upsert."""
