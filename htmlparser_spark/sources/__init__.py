"""Table sources: transcripts synthesizer + parquet/iceberg IO."""
