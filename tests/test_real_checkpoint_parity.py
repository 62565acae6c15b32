"""
Conversion parity on the reference's REAL shipped trained weights.

The reference repo bundles exactly two trained checkpoints
(experiments/*/predictors/PlaySlot/behaviors/Policy_AllDemos/models/
ActDec_{ButtonPress,BlockPush}.pth — the behavior-stage action decoders,
saved by src/10_learn_behavior_from_demos.py:123-149). Every other parity
test uses random-weight torch modules; this one proves the converter +
MLPActionDecoder reproduce the reference's actual trained artifacts:
torch forward vs converted-jax forward on the same inputs, <=1e-5.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_util import import_reference

_CKPTS = {
    "ButtonPress": ("/root/reference/experiments/ButtonPress/predictors/"
                    "PlaySlot/behaviors/Policy_AllDemos/models/"
                    "ActDec_ButtonPress.pth"),
    "BlockPush": ("/root/reference/experiments/BlockPush/predictors/"
                  "PlaySlot/behaviors/Policy_AllDemos/models/"
                  "ActDec_BlockPush.pth"),
}


@pytest.mark.parametrize("name", sorted(_CKPTS))
def test_shipped_actdec_checkpoint_parity(name):
    path = _CKPTS[name]
    if not os.path.isfile(path):
        pytest.skip("reference checkpoint not available")
    torch = import_reference()  # reference src on sys.path: the checkpoint
    # pickles a lib.schedulers warmup object alongside the state_dicts
    from models.Downstream.action_decoding import MLPActionDecoder as TorchDec

    from playslot_tpu.models.behavior import MLPActionDecoder
    from playslot_tpu.utils.convert import (convert_action_decoder,
                                            load_torch_checkpoint,
                                            strip_module_prefix)

    ckpt = load_torch_checkpoint(path)
    assert ckpt["epoch"], "shipped checkpoint should be trained (epoch > 0)"
    sd = strip_module_prefix(ckpt["model_state_dict"])
    in_dim = sd["mlp.0.0.weight"].shape[1]
    out_dim = sd[sorted(sd)[-1].replace("bias", "weight")].shape[0]

    tdec = TorchDec(in_dim=in_dim, out_dim=out_dim, hidden_dim=[128, 128])
    tdec.load_state_dict(sd)
    tdec.eval()

    variables = convert_action_decoder(ckpt["model_state_dict"])
    jdec = MLPActionDecoder(out_dim=out_dim)

    rng = np.random.RandomState(0)
    x = rng.randn(64, in_dim).astype(np.float32)
    with torch.no_grad():
        ref = tdec(torch.from_numpy(x)).numpy()
    got = np.asarray(jdec.apply(variables, jnp.asarray(x)))
    err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 1e-5, (name, err)
