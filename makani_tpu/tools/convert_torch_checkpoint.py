"""Convert reference (PyTorch Makani) checkpoints to makani_tpu format.

Capability parity with ref: makani/convert_legacy_to_flexible.py, extended
across frameworks: loads a torch `ckpt_mp0.tar` (legacy, single model-parallel
rank) or flexible checkpoint, maps the module names onto the makani_tpu param
tree (SFNO family), converts complex weights to real pairs and squeezes 1x1
conv kernels, and writes an orbax checkpoint restorable by the Trainer /
Inferencer / model packages.

Name mapping (reference -> makani_tpu), SingleStepWrapper/SFNO:
  model.encoder.fwd.{2i}.*          -> model/encoder/fwd_{i}/*
  model.encoder.fwd.{2L}.*          -> model/encoder/out/*
  model.blocks.{i}.filter.filter.*  -> model/blocks_{i}/SpectralFilterLayer_0/filter/*
  model.blocks.{i}.norm{0,1}.*      -> model/blocks_{i}/norm{0,1}/*
  model.blocks.{i}.{inner,outer}_skip.weight -> model/blocks_{i}/..._skip/weight
  model.blocks.{i}.mlp.fwd.0.*      -> model/blocks_{i}/mlp/fc1/*
  model.blocks.{i}.mlp.fwd.3.*      -> model/blocks_{i}/mlp/fc2/*
  model.decoder.*                   -> model/decoder/*
  model.pos_embed                   -> model/pos_embed
  model.residual_transform.weight   -> model/residual_transform
"""

import argparse
import re

import numpy as np


def _to_pair(arr):
    """torch complex tensor (as numpy) -> real-pair array (..., 2)."""
    if np.iscomplexobj(arr):
        return np.stack([arr.real, arr.imag], axis=-1).astype(np.float32)
    return np.asarray(arr, dtype=np.float32)


def _squeeze_conv(arr):
    """1x1 conv kernel (O, I, 1, 1) -> (O, I)."""
    a = np.asarray(arr)
    if a.ndim == 4 and a.shape[-1] == 1 and a.shape[-2] == 1:
        return a[..., 0, 0]
    return a


def map_reference_state_dict(state_dict, encoder_layers=1):
    """Reference state_dict (name -> numpy array) -> flat path dict for the
    makani_tpu param tree ("/"-joined keys)."""
    out = {}
    final_idx = 2 * encoder_layers

    def enc_name(stack, idx, leaf):
        if int(idx) == final_idx:
            return f"model/{stack}/out/{leaf}"
        return f"model/{stack}/fwd_{int(idx) // 2}/{leaf}"

    for key, val in state_dict.items():
        key = re.sub(r"^module\.", "", key)
        val = np.asarray(val)
        m = re.match(r"model\.(encoder|decoder)\.fwd\.(\d+)\.(weight|bias)$", key)
        if m:
            out[enc_name(m.group(1), m.group(2), m.group(3))] = _squeeze_conv(val)
            continue
        m = re.match(r"model\.blocks\.(\d+)\.filter\.filter\.(weight|bias)$", key)
        if m:
            leaf = "weight" if m.group(2) == "weight" else "bias_const"
            out[f"model/blocks_{m.group(1)}/SpectralFilterLayer_0/filter/{leaf}"] = _to_pair(val)
            continue
        # SpectralAttention (filter_type="non-linear"): w ParameterList,
        # wout, optional b ParameterList (ref: spectral_convolution.py:317-330)
        m = re.match(r"model\.blocks\.(\d+)\.filter\.filter\.(w|b)\.(\d+)$", key)
        if m:
            out[f"model/blocks_{m.group(1)}/SpectralFilterLayer_0/filter/"
                f"{m.group(2)}_{m.group(3)}"] = _to_pair(val)
            continue
        m = re.match(r"model\.blocks\.(\d+)\.filter\.filter\.wout$", key)
        if m:
            out[f"model/blocks_{m.group(1)}/SpectralFilterLayer_0/filter/wout"] = _to_pair(val)
            continue
        m = re.match(r"model\.blocks\.(\d+)\.(norm0|norm1)\.(weight|bias)$", key)
        if m:
            out[f"model/blocks_{m.group(1)}/{m.group(2)}/{m.group(3)}"] = np.asarray(val, np.float32)
            continue
        m = re.match(r"model\.blocks\.(\d+)\.(inner_skip|outer_skip)\.weight$", key)
        if m:
            out[f"model/blocks_{m.group(1)}/{m.group(2)}/weight"] = _squeeze_conv(val)
            continue
        m = re.match(r"model\.blocks\.(\d+)\.mlp\.fwd\.(\d+)\.(weight|bias)$", key)
        if m:
            fc = "fc1" if int(m.group(2)) == 0 else "fc2"
            out[f"model/blocks_{m.group(1)}/mlp/{fc}/{m.group(3)}"] = _squeeze_conv(val)
            continue
        if key == "model.pos_embed":
            out["model/pos_embed"] = np.asarray(val, np.float32)
            continue
        # frequency pos-embed: reference stores a ParameterList [rcoeffs,
        # ccoeffs] (sfnonet.py:487-493) -> pos_embed_r / pos_embed_c
        if key == "model.pos_embed.0":
            out["model/pos_embed_r"] = np.asarray(val, np.float32)
            continue
        if key == "model.pos_embed.1":
            out["model/pos_embed_c"] = np.asarray(val, np.float32)
            continue
        if key == "model.residual_transform.weight":
            out["model/residual_transform"] = _squeeze_conv(val)
            continue
        # preprocessor buffers and unknown keys are skipped (non-learnable)
    return out


def apply_to_tree(params_template, flat_mapped, strict=True):
    """Place flat "/"-path arrays into a params pytree template."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    placed, missing = [], []
    used = set()
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        if path in flat_mapped:
            src = flat_mapped[path]
            assert tuple(src.shape) == tuple(leaf.shape), (
                f"{path}: shape mismatch {src.shape} vs {leaf.shape}")
            placed.append(np.asarray(src, dtype=np.asarray(leaf).dtype
                                     if hasattr(leaf, "dtype") else np.float32))
            used.add(path)
        else:
            missing.append(path)
            placed.append(leaf)
    unused = sorted(set(flat_mapped) - used)
    if strict and (missing or unused):
        raise ValueError(f"unmatched params: missing={missing[:8]} unused={unused[:8]}")
    return jax.tree_util.tree_unflatten(treedef, placed), missing, unused


def convert(torch_ckpt_path, output_path, params):
    """Full conversion: torch .tar -> orbax checkpoint dir."""
    import torch
    import jax
    import jax.numpy as jnp
    from makani_tpu.models import model_registry
    from makani_tpu.utils import checkpoint as ckpt_lib

    ckpt = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt)
    state_np = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in state.items()}

    model = model_registry.get_model(params)
    n_chans = len(params.in_channels)
    init_inp = jnp.zeros((1, (params.n_history + 1) * n_chans,
                          params.img_shape_x, params.img_shape_y), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, init_inp, deterministic=True))(
        jax.random.PRNGKey(0))

    flat_mapped = map_reference_state_dict(state_np, params.get("encoder_layers", 1))
    new_params, missing, unused = apply_to_tree(variables["params"], flat_mapped, strict=False)
    ckpt_lib.save_checkpoint(output_path, new_params, None,
                             {"iters": int(ckpt.get("iters", 0)),
                              "epoch": int(ckpt.get("epoch", 0))})
    return missing, unused


if __name__ == "__main__":
    from makani_tpu.utils.yparams import YParams
    from makani_tpu.utils.dataset_metadata import parse_dataset_metadata

    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="reference ckpt_mp0.tar")
    parser.add_argument("--output", required=True, help="output orbax checkpoint dir")
    parser.add_argument("--yaml_config", required=True)
    parser.add_argument("--config", required=True)
    args = parser.parse_args()

    params = YParams(args.yaml_config, args.config)
    if params.get("metadata_json_path"):
        params, _ = parse_dataset_metadata(params.metadata_json_path, params)
    missing, unused = convert(args.input, args.output, params)
    print(f"converted; {len(missing)} unmatched target params, {len(unused)} unused source tensors")
    for p in missing[:10]:
        print("  missing:", p)
    for p in unused[:10]:
        print("  unused:", p)
