"""Isolated TorchScript entry points.

The reference ships opaque TorchScript blobs for two fallback paths:
ONT polish models named ``model.pt`` (reference
dorado/secondary/architectures/model_torch_script.h, loaded by
model_factory.cpp:186-201) and the HERRO correction model
(dorado/correct/CorrectionInferenceNode.cpp:247-283). Reading those files
requires ``torch.jit.load`` — there is no replacement API: ``torch.export``
/ ``torch.compile`` consume different artifact formats and cannot open a
TorchScript zip. torch 2.13 deprecates the ``torch.jit`` namespace, so this
module is the single place in the package that touches it: it suppresses
the deprecation noise (166 repeated warnings across a test run otherwise)
and converts a future hard removal into one actionable error message.

The JAX model zoo (secondary/architectures.py) is the primary path; these
loaders only run when a user points at an opaque ``.pt`` blob.
"""

from __future__ import annotations

import warnings


def load_torchscript(path):
    """Load a TorchScript module from ``path`` on CPU in eval mode.

    Raises RuntimeError with migration guidance if the installed torch has
    removed the ``torch.jit`` namespace entirely.
    """
    import torch

    jit = getattr(torch, "jit", None)
    load = getattr(jit, "load", None) if jit is not None else None
    if load is None:  # pragma: no cover - future torch versions
        raise RuntimeError(
            f"this torch build ({torch.__version__}) no longer provides "
            "torch.jit.load, which is required to read TorchScript model "
            f"blobs like {path!s}. Re-export the model weights as a state "
            "dict (weights.pt) and use the built-in JAX architectures "
            "(dorado_tpu.secondary.architectures), or pin torch<3."
        )
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", category=DeprecationWarning)
        warnings.filterwarnings("ignore", category=FutureWarning)
        module = load(str(path), map_location="cpu")
    module.eval()
    return module


def script_and_save(module, path):
    """Script ``module`` and save it to ``path`` (test-fixture helper).

    Only tests use this — the package itself never *writes* TorchScript.
    Kept beside load_torchscript so every deprecated torch.jit entry point
    lives in one file.
    """
    import torch

    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", category=DeprecationWarning)
        warnings.filterwarnings("ignore", category=FutureWarning)
        scripted = torch.jit.script(module)
        scripted.save(str(path))
    return scripted
