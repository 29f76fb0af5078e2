from .ddl import bootstrap_from_ddl, create_table_from_ddl  # noqa: F401
from .metastore import MetadataStore, load_pipeline_specs  # noqa: F401
from .runner import PipelineRunner  # noqa: F401
from .spec import PIPELINES, PipelineSpec, topo_sorted_waves  # noqa: F401
from .warehouse import Warehouse  # noqa: F401
