"""Sources & sinks (SURVEY.md §2.1/§2.2): Kafka wrappers, file-backed
topics, file tail, JDBC incremental, rate-limited replay."""
