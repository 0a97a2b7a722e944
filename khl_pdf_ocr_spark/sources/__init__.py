"""Sources & sinks: document table readers, master dimension tables."""
