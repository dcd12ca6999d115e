from layout2img_tpu.eval.inception import InceptionV3, load_torch_inception_v3
from layout2img_tpu.eval.metrics import inception_score, frechet_distance, fid_from_features
from layout2img_tpu.eval.lpips import LPIPS

__all__ = [
    "InceptionV3",
    "load_torch_inception_v3",
    "inception_score",
    "frechet_distance",
    "fid_from_features",
    "LPIPS",
]
