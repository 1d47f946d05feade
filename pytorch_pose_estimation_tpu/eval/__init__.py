from .cocoeval import KeypointEvaluator
from .metrics import SBPmAPCOCO, SPMmAPCOCO, SBPmAPPIS

__all__ = ["KeypointEvaluator", "SBPmAPCOCO", "SPMmAPCOCO", "SBPmAPPIS"]
