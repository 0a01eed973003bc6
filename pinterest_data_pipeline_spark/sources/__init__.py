"""Sources and sinks: synthetic raw-entity generator, JSON landing-dir scan,
streaming landing writer. Replaces the reference's AWS plumbing (MySQL ->
Kafka REST -> MSK -> S3 / Kinesis) with local idiomatic Spark sources while
preserving the wire semantics (envelopes, one-object-per-record landing,
aligned 1:1 row triplets)."""
