"""Single-step and multi-step model wrappers.

Functional re-design of ref: makani/models/stepper.py:21-157. The unpredicted
(zenith) feature windows are explicit arguments instead of cached module
state; the fork's hardcoded SST land-sea-mask gating (stepper.py:45-66) is a
config capability here (`lsm_mask_channels`), and the upstream MultiStepWrapper
behavior disabled by the fork's guard (stepper.py:148-150) is restored.
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from makani_tpu.models.preprocessor import Preprocessor2D


class SingleStepWrapper(nn.Module):
    """preprocess -> model -> denormalize (ref: stepper.py:21-71)."""

    preprocessor: Preprocessor2D
    model: nn.Module
    lsm_mask_channels: tuple = ()

    def _lsm_gate(self, x, lsm):
        """Multiply configured channels by the land one-hot plane — fork
        capability (ref: stepper.py:45-66)."""
        out = x
        for c in self.lsm_mask_channels:
            out = out.at[:, c].mul(lsm)
        return out

    def __call__(self, inp, unpredicted_inp=None, unpredicted_tar=None, deterministic=True):
        prep = self.preprocessor

        inpa = inp if unpredicted_inp is None else prep.append_channels(inp, unpredicted_inp)

        stats = prep.history_compute_stats(inpa)
        inpan = prep.history_normalize(inpa, stats, target=False)

        inpans = prep.add_static_features(inpan)

        if self.lsm_mask_channels:
            lsm = inpans[:, -1]
            inpans = self._lsm_gate(inpans, lsm)

        yn = self.model(inpans, deterministic=deterministic)

        y = prep.history_denormalize(yn, stats, target=True)

        if self.lsm_mask_channels:
            y = self._lsm_gate(y, lsm)

        y = prep.add_residual(inp, y)

        return y


class MultiStepWrapper(nn.Module):
    """Unroll n_future+1 single steps with history append during training;
    single step in eval (ref: stepper.py:74-157, upstream behavior)."""

    preprocessor: Preprocessor2D
    model: nn.Module
    n_future: int = 0
    lsm_mask_channels: tuple = ()

    def _single(self, inpt, unpredicted_inp, deterministic):
        prep = self.preprocessor
        inpa = inpt if unpredicted_inp is None else prep.append_channels(inpt, unpredicted_inp)
        stats = prep.history_compute_stats(inpa)
        inpan = prep.history_normalize(inpa, stats, target=False)
        inpans = prep.add_static_features(inpan)
        if self.lsm_mask_channels:
            # same land-sea-mask gate as SingleStepWrapper (fork capability,
            # ref: stepper.py:45-66) — applies at every unrolled step
            lsm = inpans[:, -1]
            for c in self.lsm_mask_channels:
                inpans = inpans.at[:, c].mul(lsm)
        predn = self.model(inpans, deterministic=deterministic)
        pred = prep.history_denormalize(predn, stats, target=True)
        if self.lsm_mask_channels:
            for c in self.lsm_mask_channels:
                pred = pred.at[:, c].mul(lsm)
        pred = prep.add_residual(inpt, pred)
        return pred

    def __call__(self, inp, unpredicted_inp=None, unpredicted_tar=None, deterministic=True):
        prep = self.preprocessor

        # eval mode: a single step regardless of n_future (ref: stepper.py:123-145)
        if deterministic:
            return self._single(inp, unpredicted_inp, deterministic)

        # training: unroll; the python loop is static (n_future is a
        # hyperparameter) so XLA sees a fixed-depth graph
        result = []
        inpt = inp
        uinp = unpredicted_inp
        for step in range(self.n_future + 1):
            pred = self._single(inpt, uinp, deterministic)
            result.append(pred)
            if step == self.n_future:
                break
            uinp = prep.advance_unpredicted(uinp, unpredicted_tar, step)
            inpt = prep.append_history(inpt, pred)

        # concat along channels to match the flattened target (ref: stepper.py:119)
        return jnp.concatenate(result, axis=1)
