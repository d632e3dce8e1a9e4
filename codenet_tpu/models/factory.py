"""Model factory (reference lib/models/model.py:17-32).

arch strings are '<name>_<num_layers>' (e.g. 'res_18', 'shufflenetv2'); the
numeric suffix is split off exactly as the reference does.
"""

from __future__ import annotations

from .shufflenetv2 import get_shufflenetv2_dcn


def _get_resnet(num_layers, heads, head_conv=64, **kw):
    from .resnet import get_pose_net
    return get_pose_net(num_layers, heads, head_conv, **kw)


def _get_resdcn(num_layers, heads, head_conv=64, **kw):
    from .resnet import get_pose_net_dcn
    return get_pose_net_dcn(num_layers, heads, head_conv, **kw)


def _get_dladcn(num_layers, heads, head_conv=256, **kw):
    from .dla_dcn import get_pose_net
    return get_pose_net(num_layers, heads, head_conv, **kw)


def _get_dlav0(num_layers, heads, head_conv=256, **kw):
    from .dlav0 import get_pose_net
    return get_pose_net(num_layers, heads, head_conv, **kw)


def _get_hourglass(num_layers, heads, head_conv=64, **kw):
    from .hourglass import get_large_hourglass_net
    return get_large_hourglass_net(num_layers, heads, head_conv, **kw)


MODEL_FACTORY = {
    "res": _get_resnet,
    # resdcn / dla: the DCNv2-upsampling archs present in the reference
    # tree (resnet_dcn.py, pose_dla_dcn.py) but commented out of its
    # factory (model.py:12-13,20-21) — wired and working here
    "resdcn": _get_resdcn,
    "dla": _get_dladcn,
    "dlav0": _get_dlav0,
    "hourglass": _get_hourglass,
    "shufflenetv2": get_shufflenetv2_dcn,
}


def create_model(arch, heads, head_conv, w2=False, maxpool=False, qspec=None,
                 dtype=None):
    """Build an (uninitialized) flax model.

    Unlike the reference (model.py:27-32), w2/maxpool are threaded through —
    the reference silently dropped them, requiring source edits for configs
    b/d/e.
    """
    num_layers = int(arch[arch.find("_") + 1:]) if "_" in arch else 0
    arch_name = arch[:arch.find("_")] if "_" in arch else arch
    get_model = MODEL_FACTORY[arch_name]
    kwargs = dict(qspec=qspec, dtype=dtype)
    if arch_name == "shufflenetv2":
        kwargs.update(w2=w2, maxpool=maxpool)
    return get_model(num_layers, heads, head_conv, **kwargs)
