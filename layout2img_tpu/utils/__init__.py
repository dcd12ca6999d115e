from layout2img_tpu.utils.logging import setup_logger, MetricWriter

__all__ = ["setup_logger", "MetricWriter"]
