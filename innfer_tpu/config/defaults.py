"""Network-config normalizer: alias resolution + per-arch hyperparameter defaults.

Behavioral equivalent of the reference's ``get_network_G_config``
(/root/reference/utils/defaults.py:3-148), restructured as data-driven
default tables.  Accepts a type string or a traiNNer-style dict (with a
``which_model_G`` or ``type`` key) and returns the complete kwargs for the
model factory in ``innfer_tpu.models``.
"""
from __future__ import annotations

from typing import Any, Dict, Union


def _match_kind(kind: str) -> str:
    """Resolve an arch alias to its canonical factory type."""
    if kind in ("rrdb_net", "esrgan", "evsrgan", "esrgan-lite"):
        return "rrdb_net"
    if kind in ("mrrdb_net", "mesrgan"):
        return "mrrdb_net"
    if kind in ("sr_resnet", "srresnet", "srgan"):
        return "sr_resnet"
    if "ppon" in kind:
        return "ppon"
    if kind in ("pan_net", "pan"):
        return "pan_net"
    if "wbcunet" in kind:
        return "wbcunet_net"
    if "unet" in kind or "p2p" in kind:
        return "unet_net"
    if ("resnet" in kind and kind != "sr_resnet") or "cg" in kind:
        return "resnet_net"
    raise NotImplementedError(f"Generator model [{kind}] not recognized")


def get_network_config(network: Union[str, Dict[str, Any]], scale: int) -> Dict[str, Any]:
    """Fill per-architecture defaults for a (possibly partial) network spec.

    Mirrors reference defaults.py: the same alias sets, the same default
    values, the same alias-conditional tweaks (esrgan-lite nf/nb, evsrgan
    Conv3D, unet_128/256 num_downs, resnet_6/9 n_blocks, wbcunet tf mode).
    """
    scale = int(scale)
    if isinstance(network, str):
        kind = network.lower()
        opts: Dict[str, Any] = {}
    else:
        opts = dict(network)
        key = "which_model_G" if "which_model_G" in opts else "type"
        kind = str(opts.pop(key)).lower()

    canon = _match_kind(kind)
    pop = opts.pop
    cfg: Dict[str, Any] = {"type": canon}

    if canon == "rrdb_net":
        lite = kind == "esrgan-lite"
        cfg.update(
            norm_type=pop("norm_type", None),
            mode=pop("mode", "CNA"),
            nf=pop("nf", 32 if lite else 64),
            nb=pop("nb", 12 if lite else 23),
            nr=pop("nr", 3),
            in_nc=pop("in_nc", 3),
            out_nc=pop("out_nc", 3),
            gc=pop("gc", 32),
            convtype=pop("convtype", "Conv3D" if kind == "evsrgan" else "Conv2D"),
            act_type=pop("net_act", None) or pop("act_type", "leakyrelu"),
            gaussian_noise=pop("gaussian", True),
            plus=pop("plus", False),
            finalact=pop("finalact", None),
            upscale=pop("scale", scale),
            upsample_mode=pop("upsample_mode", "upconv"),
        )
    elif canon == "mrrdb_net":
        cfg.update(
            in_nc=pop("in_nc", 3),
            out_nc=pop("out_nc", 3),
            nf=pop("nf", 64),
            nb=pop("nb", 24),
            gc=pop("gc", 32),
        )
    elif canon == "sr_resnet":
        cfg.update(
            in_nc=pop("in_nc", 3),
            out_nc=pop("out_nc", 3),
            nf=pop("nf", 64),
            nb=pop("nb", 16),
            upscale=pop("scale", scale),
            norm_type=pop("norm_type", None),
            act_type=pop("net_act", None) or pop("act_type", "relu"),
            mode=pop("mode", "CNA"),
            upsample_mode=pop("upsample_mode", "pixelshuffle"),
            convtype=pop("convtype", "Conv2D"),
            finalact=pop("finalact", None),
            res_scale=pop("res_scale", 1),
        )
    elif canon == "ppon":
        cfg.update(
            in_nc=pop("in_nc", 3),
            out_nc=pop("out_nc", 3),
            nf=pop("nf", 64),
            nb=pop("nb", 24),
            upscale=pop("scale", scale),
            act_type=pop("net_act", None) or pop("act_type", "leakyrelu"),
            alpha=pop("alpha", 1),
        )
    elif canon == "pan_net":
        cfg.update(
            in_nc=pop("in_nc", 3),
            out_nc=pop("out_nc", 3),
            nf=pop("nf", 40),
            unf=pop("unf", 24),
            nb=pop("nb", 16),
            scale=pop("scale", scale),
            self_attention=pop("self_attention", True),
            double_scpa=pop("double_scpa", False),
            ups_inter_mode=pop("ups_inter_mode", "nearest"),
        )
    elif canon == "wbcunet_net":
        cfg.update(nf=pop("nf", 32))
        cfg["mode"] = "tf" if "tf" in kind else pop("mode", "pt")
    elif canon == "unet_net":
        if kind in ("unet_128", "p2p_128"):
            default_downs = 7
        else:  # unet_256/p2p_256 and any other unet alias
            default_downs = 8
        cfg.update(
            input_nc=pop("in_nc", 3),
            output_nc=pop("out_nc", 3),
            num_downs=pop("num_downs", default_downs),
            ngf=pop("ngf", 64),
            norm_type=pop("norm_type", "batch"),
            use_dropout=pop("use_dropout", False),
            upsample_mode=pop("upsample_mode", "deconv"),
        )
    elif canon == "resnet_net":
        if kind in ("resnet_6blocks", "resnet_6", "cg_6"):
            default_blocks = 6
        else:  # resnet_9blocks/resnet_9/cg9 and any other alias
            default_blocks = 9
        cfg.update(
            input_nc=pop("in_nc", 3),
            output_nc=pop("out_nc", 3),
            n_blocks=pop("n_blocks", default_blocks),
            ngf=pop("ngf", 64),
            norm_type=pop("norm_type", "instance"),
            use_dropout=pop("use_dropout", False),
            upsample_mode=pop("upsample_mode", "deconv"),
            padding_type=pop("padding_type", "reflect"),
        )

    # Forward the extension keys the builders consume from cfg.  The
    # reference's normalizer also drops unknown spec keys (parity for
    # junk), and treats outm as a forward() kwarg its CLI never passes —
    # but a spec key this framework's builders DO read (rrdb/srresnet
    # outm; rrdb/resnet/ppon backend) must survive normalization instead
    # of being silently discarded.
    for extra in ("outm", "backend"):
        if extra in opts:
            cfg[extra] = opts.pop(extra)
    return cfg
