from .bronze_stream import BronzeStream, windowed_event_counts  # noqa: F401
from .gold_stream import ContinuousPipeline  # noqa: F401
