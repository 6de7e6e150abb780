"""innfer-tpu: TPU-native JAX image-restoration inference framework.

Public API:

    from innfer_tpu import load_model, InferenceSession, TiledRunner

    model, params = load_model("4x_ESRGAN.pth")       # torch-free, auto-detect
    runner = TiledRunner(model.apply, model.scale)
    sr = runner(params, lr_image_nhwc)

See README.md / ARCHITECTURE.md.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep bare import light (no eager jax import)
    if name in ("load_model", "load_model_from_state"):
        from innfer_tpu import loader

        return getattr(loader, name)
    if name == "InferenceSession":
        from innfer_tpu.pipeline import InferenceSession

        return InferenceSession
    if name == "TiledRunner":
        from innfer_tpu.tiling.engine import TiledRunner

        return TiledRunner
    if name == "get_network":
        from innfer_tpu.models import get_network

        return get_network
    raise AttributeError(f"module 'innfer_tpu' has no attribute {name!r}")
