"""SparkSession builders and scale-oriented configuration."""
