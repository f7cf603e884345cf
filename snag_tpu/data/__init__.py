from snag_tpu.data.graph import Graph, build_graph  # noqa: F401
from snag_tpu.data.dataset import KGData, load_data  # noqa: F401
