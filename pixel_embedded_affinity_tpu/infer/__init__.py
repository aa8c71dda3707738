from .inference2d import run_inference_2d
from .inference3d import run_inference_3d
from .export import export_checkpoint, load_artifact
