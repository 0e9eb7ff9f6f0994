"""Load the *actual* reference implementation as a parity oracle.

The reference repo is mounted read-only at ``/root/reference``; its
``model.py`` needs only torch (plus a ``utils.cc`` device helper that we
stub to identity so everything stays on CPU — reference utils.py:8-10 and
its tensorboardX/editdistance imports are irrelevant to the model).

This is the north-star correctness gate (BASELINE.md): rather than
comparing against a re-stated torch-functional oracle, we instantiate the
reference's own ``AE`` (model.py:373-395) at the full shipped config
(config.yaml:1-52), export its ``state_dict``, convert through
``torch_import.torch_state_dict_to_params`` and assert converted-mel
allclose. If a pretrained ``vctk_model.ckpt`` is available its weights are
used; otherwise a seeded random init exercises exactly the same code path.
"""

from __future__ import annotations

import sys
import types
from typing import Optional

REFERENCE_DIR = "/root/reference"
_REF_MODULE_KEY = "_avc_reference_model"


def load_reference_model_module(reference_dir: str = REFERENCE_DIR):
    """Import the reference's model.py under an isolated module name.

    Stubs ``utils`` (reference model.py:9 ``from utils import cc``) with an
    identity ``cc`` so no CUDA / tensorboardX / editdistance is required,
    and avoids polluting sys.path beyond the import.
    """
    if _REF_MODULE_KEY in sys.modules:
        return sys.modules[_REF_MODULE_KEY]

    import importlib.util

    had_utils = "utils" in sys.modules
    saved_utils = sys.modules.get("utils")
    stub = types.ModuleType("utils")
    stub.cc = lambda net: net
    sys.modules["utils"] = stub
    try:
        spec = importlib.util.spec_from_file_location(
            _REF_MODULE_KEY, f"{reference_dir}/model.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[_REF_MODULE_KEY] = mod
        spec.loader.exec_module(mod)
    finally:
        if had_utils:
            sys.modules["utils"] = saved_utils
        else:
            sys.modules.pop("utils", None)
    return mod


def load_reference_config(reference_dir: str = REFERENCE_DIR) -> dict:
    """The reference's shipped config.yaml as a raw dict (config.yaml:1-52)."""
    import yaml

    with open(f"{reference_dir}/config.yaml") as f:
        return yaml.safe_load(f)


def build_reference_ae(
    seed: int = 0,
    ckpt_path: Optional[str] = None,
    reference_dir: str = REFERENCE_DIR,
):
    """Instantiate the reference AE at the full shipped config on CPU.

    Returns ``(torch_ae_eval_mode, raw_config_dict)``. With ``ckpt_path``
    the pretrained state_dict is loaded (inference.py:42-45 semantics);
    otherwise torch's seeded default init is used.
    """
    import torch

    mod = load_reference_model_module(reference_dir)
    raw = load_reference_config(reference_dir)
    torch.manual_seed(seed)
    ae = mod.AE(raw)
    if ckpt_path is not None:
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        ae.load_state_dict(sd)
    ae.eval()
    return ae, raw
