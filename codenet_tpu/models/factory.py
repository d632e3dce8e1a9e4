"""Model factory (reference lib/models/model.py:17-32).

arch strings are '<name>_<num_layers>' (e.g. 'res_18', 'shufflenetv2'); the
numeric suffix is split off exactly as the reference does.
"""

from __future__ import annotations

from .shufflenetv2 import get_shufflenetv2_dcn


def _get_resnet(num_layers, heads, head_conv=64, **kw):
    from .resnet import get_pose_net
    return get_pose_net(num_layers, heads, head_conv, **kw)


def _get_dlav0(num_layers, heads, head_conv=256, **kw):
    from .dlav0 import get_pose_net
    return get_pose_net(num_layers, heads, head_conv, **kw)


def _get_hourglass(num_layers, heads, head_conv=64, **kw):
    from .hourglass import get_large_hourglass_net
    return get_large_hourglass_net(num_layers, heads, head_conv, **kw)


MODEL_FACTORY = {
    "res": _get_resnet,
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
    if arch_name == "dla":
        # The reference's default --arch dla_34 maps to pose_dla_dcn, which
        # its own factory comments out (model.py:12-13,20-21); alias to the
        # shipped DLA-v0 so the no-flag invocation works.
        print("warning: arch 'dla' is not shipped (matches reference "
              "model.py:12-13); using 'dlav0'")
        arch_name = "dlav0"
    get_model = MODEL_FACTORY[arch_name]
    kwargs = dict(qspec=qspec, dtype=dtype)
    if arch_name == "shufflenetv2":
        kwargs.update(w2=w2, maxpool=maxpool)
    return get_model(num_layers, heads, head_conv, **kwargs)
