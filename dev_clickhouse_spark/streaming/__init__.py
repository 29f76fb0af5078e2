from .bronze_stream import BronzeStream, windowed_event_counts  # noqa: F401
from .gold_stream import ContinuousPipeline  # noqa: F401
from .corpus_stream import CorpusStream  # noqa: F401
from .state_mv import StateRollupMV  # noqa: F401
from .joins import enrich_with_static, interval_join_streams  # noqa: F401
