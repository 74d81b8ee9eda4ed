from graph_data_science_spark.pregel.api import (
    PregelComputation,
    PregelResult,
    run_pregel,
)
from graph_data_science_spark.pregel.spmv import BlockedEdges, build_blocks
from graph_data_science_spark.pregel.superstep import SuperstepLoop

__all__ = [
    "BlockedEdges",
    "build_blocks",
    "SuperstepLoop",
    "PregelComputation",
    "PregelResult",
    "run_pregel",
]
