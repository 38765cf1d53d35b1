"""Sources & sinks: typed readers, the partitioned offline store, and the
keyed online store (the engine-native replacements for the reference's
CSV -> HTTP -> Postgres and Redis paths)."""
