from kgc_gcn_tpu.utils.logging import RunningAverage, set_logger

__all__ = ["RunningAverage", "set_logger"]
