from .bronze_stream import BronzeStream, windowed_event_counts  # noqa: F401
