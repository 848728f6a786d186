"""The Supervised Descent Method cascade — the heart of the framework.

TPU-native rebuild of the reference SupervisedDescentOptimiser
(/root/reference/include/superviseddescent/superviseddescent.hpp:85-361).

Key design translation (see SURVEY.md §3.1/§3.2):

  * The reference evaluates the projection function h per training sample on
    a std::thread pool created per cascade level
    (superviseddescent.hpp:173-189). Here h is *batched by contract*:
    ``h(x: (N, P), level) -> (N, F)`` and is expected to be jit/vmap
    compatible, so the per-sample axis maps onto the VPU/MXU instead of CPU
    threads. Use :func:`batch_projection` to adapt a per-sample function.

  * Training per level is: features = h(x); b = (x - x*) * norm(x);
    W = ridge_solve(observed, b); x' = x - (observed @ W) / norm(x)
    (superviseddescent.hpp:191-216). Features are extracted once per level
    and reused for learn and apply, like the reference.

  * Inference (`predict`/`test`) is one jit-compiled unrolled loop over the
    level weight stack, vmapped over samples — the whole RCR detect path
    becomes a single XLA program (reference: single-threaded Python-style
    loop, superviseddescent.hpp:323-344).

  * The per-level callback (the reference's observability API,
    superviseddescent.hpp:165-217) is preserved two ways: an optional host
    callback between levels, and the stacked per-level predictions returned
    from train/test for purely-functional consumers.

There are two template modes, exactly as in the reference (:191-197):
  templates is None  -> observed = h(x)            (e.g. landmark detection)
  templates given    -> observed = h(x) - y        (e.g. pose estimation)
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from superviseddescent_tpu.core.regressor import LinearRegressor


class NoNormalisation:
    """Default normalisation strategy: a row of ones (no-op).

    Reference: superviseddescent.hpp:60-74.
    """

    def __call__(self, params: jnp.ndarray) -> jnp.ndarray:
        return jnp.ones_like(params)


def batch_projection(per_sample_fn: Callable) -> Callable:
    """Adapt a per-sample projection ``f(x_row, level) -> row`` to the batched
    contract ``h(x: (N,P), level) -> (N,F)`` via vmap.

    This replaces the reference's thread-pool fan-out with a vectorised map
    (superviseddescent.hpp:173-189 -> vmap over the sample axis).
    """

    def batched(x, level):
        return jax.vmap(lambda row: jnp.atleast_1d(
            jnp.asarray(per_sample_fn(row, level))))(x)

    return batched


class SupervisedDescentOptimiser:
    """A cascade of regressors learning descent directions from data.

    Args:
      regressors: one or several LinearRegressor (applied in series).
      normalisation: callable ``(N, P) -> (N, P)`` returning per-sample
        normalisation factors (e.g. 1/IED rows for RCR). Default: ones.
    """

    def __init__(self, regressors: Sequence[LinearRegressor],
                 normalisation: Optional[Callable] = None):
        self.regressors: List[LinearRegressor] = list(regressors)
        self.normalisation = normalisation or NoNormalisation()

    # ------------------------------------------------------------------ #
    # Training
    # ------------------------------------------------------------------ #
    def train(self, parameters, initialisations, templates, projection,
              on_training_epoch_callback: Optional[Callable] = None,
              start_level: int = 0,
              learn_fn: Optional[Callable] = None):
        """Learn the cascade from ground truth + initialisations.

        Args:
          parameters: (N, P) ground-truth parameter rows (x*).
          initialisations: (N, P) starting values (x0). When resuming
            (start_level > 0), pass the current estimates after the last
            completed level instead.
          templates: (N, F) known templates y, or None (see module doc).
          projection: batched h(x, level) -> (N, F).
          on_training_epoch_callback: optional host fn called with the
            current (N, P) predictions after each level.
          start_level: first level to learn (for checkpoint/resume; levels
            before it must already hold weights).
          learn_fn: optional override of the per-level learn step,
            ``(regressor, observed, b, level) -> LinearRegressor`` — e.g.
            the psum-reduced distributed solve
            (parallel/dist.py::distributed_train_level).

        Returns:
          (R', N, P) stacked per-level predictions for the levels trained
          in this call (the functional analogue of the callback stream).

        The cascade levels are inherently sequential (level k+1's features
        depend on level k's outputs) so the outer loop is a Python loop; each
        level's feature-extract / solve / update runs jitted on device.
        """
        parameters = jnp.asarray(parameters)
        current_x = jnp.asarray(initialisations)
        history = []
        for level in range(start_level, len(self.regressors)):
            features = projection(current_x, level)
            observed = features if templates is None else features - jnp.asarray(templates)
            norm = self.normalisation(current_x)
            b = (current_x - parameters) * norm
            if learn_fn is not None:
                self.regressors[level] = learn_fn(
                    self.regressors[level], observed, b, level)
            else:
                self.regressors[level] = self.regressors[level].learn(
                    observed, b)
            update = self.regressors[level].predict(observed) / norm
            current_x = current_x - update
            history.append(current_x)
            if on_training_epoch_callback is not None:
                on_training_epoch_callback(current_x)
        return jnp.stack(history) if history else jnp.zeros((0,) + current_x.shape)

    # ------------------------------------------------------------------ #
    # Inference
    # ------------------------------------------------------------------ #
    def _apply_levels(self, current_x, templates, projection):
        """Unrolled cascade application — traceable; one XLA program when
        called under jit. Returns (final_x, stacked per-level xs)."""
        history = []
        for level, regressor in enumerate(self.regressors):
            features = projection(current_x, level)
            observed = features if templates is None else features - templates
            norm = self.normalisation(current_x)
            update = regressor.predict(observed) / norm
            current_x = current_x - update
            history.append(current_x)
        return current_x, jnp.stack(history)

    def test(self, initialisations, templates, projection,
             on_regressor_iteration_callback: Optional[Callable] = None):
        """Apply the learned cascade to a batch (reference test(),
        superviseddescent.hpp:263-306). Returns the final (N, P) predictions.

        When no host callback is given the whole loop runs as one jit-traced
        computation.
        """
        current_x = jnp.asarray(initialisations)
        templates = None if templates is None else jnp.asarray(templates)
        if on_regressor_iteration_callback is None:
            final, _ = self._apply_levels(current_x, templates, projection)
            return final
        # Callback variant: sync to host after each level.
        for level, regressor in enumerate(self.regressors):
            features = projection(current_x, level)
            observed = features if templates is None else features - templates
            norm = self.normalisation(current_x)
            current_x = current_x - regressor.predict(observed) / norm
            on_regressor_iteration_callback(current_x)
        return current_x

    def predict(self, initialisations, templates, projection):
        """Single-sample (or small-batch) prediction
        (reference predict(), superviseddescent.hpp:323-344).

        Accepts (P,) or (1, P) (or any (N, P)) initialisations.
        """
        x = jnp.asarray(initialisations)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        out = self.test(x, templates, projection)
        return out[0] if squeeze else out

    # ------------------------------------------------------------------ #
    # Compiled entry points
    # ------------------------------------------------------------------ #
    def make_predict_fn(self, templates=None):
        """Return a jittable ``f(x0, *projection_args)``-style closure over
        the current weights: ``f(x0, projection)`` is awkward to jit, so this
        binds the projection at trace time instead. Usage::

            fn = jax.jit(lambda x0: sdo.make_predict_fn()(x0, projection))
        """
        def fn(x0, projection):
            final, _ = self._apply_levels(x0, templates, projection)
            return final
        return fn

    @property
    def weight_stack(self):
        """(R, F, L) stacked weights when all levels share shapes, else a
        list. Useful for checkpointing and scan-based application."""
        ws = [r.weights for r in self.regressors]
        if any(w is None for w in ws):
            raise ValueError("cascade has unlearned levels")
        if len({w.shape for w in ws}) == 1:
            return jnp.stack(ws)
        return ws
