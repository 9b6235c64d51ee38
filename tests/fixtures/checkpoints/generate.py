"""Generate the golden checkpoint-bytes corpus (round 4, VERDICT r3 #6).

Run from the repo root on the CPU backend:

    JAX_PLATFORMS=cpu python tests/fixtures/checkpoints/generate.py

Writes one serialized ``ModelCheckpointProto`` per representative
(dynamics x payoff x knobs) cell, each from a REAL tiny training run (2
batches, so weights/optimizer/counters are non-trivial), plus
``manifest.json`` with the content hashes. The committed bytes pin
cross-round schema compatibility: ``tests/test_golden_checkpoints.py``
requires every fixture to decode AND re-encode to the identical bytes
under any future proto/converter change (reference stance: the checkpoint
is the contract, /root/reference/src/spectralmc/gbm_trainer.py:301-313).
"""

from __future__ import annotations

import json
from pathlib import Path

from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
from spectralmc_tpu.ops.basket import BasketCombine, build_basket_spec
from spectralmc_tpu.ops.gbm import ModelKind, TermStructure, build_simulation_params
from spectralmc_tpu.ops.sobol import BoundSpec
from spectralmc_tpu.serialization.converters import serialize_checkpoint
from spectralmc_tpu.training.trainer import (
    GbmCVNNPricer,
    GbmCVNNPricerConfig,
    build_training_config,
)

OUT = Path(__file__).resolve().parent

GBM_BOUNDS = {
    "spot": BoundSpec(lower=95.0, upper=105.0),
    "strike": BoundSpec(lower=95.0, upper=105.0),
    "maturity": BoundSpec(lower=0.5, upper=1.5),
    "rate": BoundSpec(lower=0.01, upper=0.05),
    "div_yield": BoundSpec(lower=0.0, upper=0.02),
    "vol": BoundSpec(lower=0.2, upper=0.3),
}
HESTON_BOUNDS = {
    **{k: v for k, v in GBM_BOUNDS.items() if k != "vol"},
    "v0": BoundSpec(lower=0.02, upper=0.08),
    "kappa": BoundSpec(lower=0.5, upper=2.5),
    "theta": BoundSpec(lower=0.02, upper=0.08),
    "xi": BoundSpec(lower=0.2, upper=0.8),
    "rho": BoundSpec(lower=-0.9, upper=-0.1),
}
MERTON_BOUNDS = {
    **GBM_BOUNDS,
    "vol": BoundSpec(lower=0.15, upper=0.3),
    "lam": BoundSpec(lower=0.1, upper=1.0),
    "jump_mean": BoundSpec(lower=-0.2, upper=0.0),
    "jump_std": BoundSpec(lower=0.1, upper=0.3),
}
T = 8
TERM = TermStructure(
    vol_shape=tuple(1.3 - 0.6 * t / (T - 1) for t in range(T)),
    rate_shape=tuple(0.7 + 0.6 * t / (T - 1) for t in range(T)),
)
RD_TERM = TermStructure(rate_shape=TERM.rate_shape)
BASKET = build_basket_spec(
    weights=(0.6, 0.4), correlation=((1.0, 0.3), (0.3, 1.0)),
    combine=BasketCombine.GEOMETRIC,
).expect("spec")

CELLS: dict[str, dict] = {
    "gbm_terminal": dict(),
    "gbm_american_put": dict(payoff="american_put", normalization="none",
                             lsmc_basis_degree=3, lsmc_exercise_every=2),
    "gbm_qmc_terminal": dict(sampling="sobol_bb"),
    "gbm_term_terminal": dict(term=TERM),
    "heston_terminal": dict(model=ModelKind.HESTON),
    "heston_term_terminal": dict(model=ModelKind.HESTON, term=RD_TERM),
    "merton_cliquet": dict(model=ModelKind.MERTON_JUMP, payoff="cliquet",
                           normalization="none", cliquet_reset_every=4,
                           cliquet_floor=0.0, cliquet_cap=0.05),
    "basket_geo_terminal": dict(model=ModelKind.BASKET_GBM, basket=BASKET),
}


def bounds_for(kwargs: dict) -> dict:
    model = kwargs.get("model", ModelKind.GBM)
    if model == ModelKind.HESTON:
        return HESTON_BOUNDS
    if model == ModelKind.MERTON_JUMP:
        return MERTON_BOUNDS
    b = dict(GBM_BOUNDS)
    if kwargs.get("payoff") == "cliquet":
        b["strike"] = BoundSpec(lower=0.01, upper=0.08)
    return b


def main() -> None:
    manifest: dict[str, str] = {}
    for name, kwargs in CELLS.items():
        sim = build_simulation_params(
            timesteps=T, network_size=16, batches_per_mc_run=8, mc_seed=11,
            **kwargs,
        ).expect(name)
        cvnn = build_cvnn_config(
            layers=[LinearCfg(width=12, activation=Activation.MODRELU)], seed=4
        ).expect("cvnn")
        pricer = GbmCVNNPricer.create(
            GbmCVNNPricerConfig(sim=sim, bounds=bounds_for(kwargs), cvnn=cvnn)
        ).expect(name)
        cfg = build_training_config(
            num_batches=2, batch_size=4, learning_rate=1e-3
        ).expect("cfg")
        pricer.train(cfg).expect(name)
        data, sha = serialize_checkpoint(pricer.snapshot())
        (OUT / f"{name}.pb").write_bytes(data)
        manifest[name] = sha
        print(f"{name}: {len(data)} bytes sha={sha[:12]}")
    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=2) + "\n")


if __name__ == "__main__":
    main()
