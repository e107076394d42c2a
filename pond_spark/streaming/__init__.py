from pond_spark.streaming.follow import continue_stream, follow_stream, follow_visitors

__all__ = ["follow_stream", "continue_stream", "follow_visitors"]
