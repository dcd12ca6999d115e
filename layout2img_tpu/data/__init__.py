from layout2img_tpu.data.synthetic import synthetic_batch, SyntheticLayoutDataset

__all__ = ["synthetic_batch", "SyntheticLayoutDataset"]
