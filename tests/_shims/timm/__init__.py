"""Minimal `timm` shim so the reference's modeling files import for the
direct-import parity tests (tests/test_reference_import_parity.py).

The reference uses exactly four timm symbols (modeling_finetune.py:15-16,
modeling_pretrain_vit.py:16-17, modeling_pretrain_moco_mim_ori.py:12-13):
`drop_path`, `to_2tuple`, `trunc_normal_` from timm.models.layers and
`register_model` from timm.models.registry.  This shim provides those and
nothing else; it lives under tests/_shims so it can never leak into the
package's own import path.
"""

from . import models  # noqa: F401

__version__ = "0.0-shim"
