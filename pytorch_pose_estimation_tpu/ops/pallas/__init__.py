from .heatmap import sbp_heatmaps_pallas
from .decode import decode_sbp_pallas

__all__ = ["sbp_heatmaps_pallas", "decode_sbp_pallas"]
