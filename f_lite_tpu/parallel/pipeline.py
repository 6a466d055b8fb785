"""Pipeline-parallel parameter layout conversion.

The GPipe trunk (models/dit.py `PipelineTrunk`) stores the pipelined
region's block parameters vmapped over a leading `stage` axis:

    plain scan:  {<trunk>: {blk_j: ...}}           leaves (n_units, ...)
    pipelined:   {<trunk>: {pipe: {stages: {blocks:
                  {blk_j: ...}}}}}                 leaves (pp, n_units/pp, ...)

where <trunk> is "blocks_all" (cross_attn_all) or "blocks_rest" (v1's
periodic region; "blocks_front" is never pipelined). The mapping is a pure
reshape — stage s holds units [s*ups, (s+1)*ups) in order — so converting
between a plain-scan checkpoint and any pipeline degree is lossless both
ways. The reference has no pipeline parallelism (FSDP only), so there is
no reference layout to match; this exists so one Orbax checkpoint serves
every (pp, fsdp, tp) deployment shape.
"""

from __future__ import annotations

import flax

_TRUNKS = ("blocks_all", "blocks_rest")


def scan_to_pipeline_params(params: dict, pp: int) -> dict:
    """Plain-scan param tree -> pipeline layout for `pp` stages."""
    out = dict(params["params"])
    for name in _TRUNKS:
        if name not in out:
            continue
        if "pipe" in out[name]:
            raise ValueError(f"{name} is already in pipeline layout")
        sub = flax.traverse_util.flatten_dict(out[name])
        for k, v in sub.items():
            if v.shape[0] % pp:
                raise ValueError(
                    f"{name}/{'/'.join(k)}: {v.shape[0]} scan units not "
                    f"divisible by pipeline_stages={pp}"
                )
        sub = {
            k: v.reshape(pp, v.shape[0] // pp, *v.shape[1:])
            for k, v in sub.items()
        }
        out[name] = {
            "pipe": {"stages": {"blocks": flax.traverse_util.unflatten_dict(sub)}}
        }
    rest = {k: v for k, v in params.items() if k != "params"}
    return {"params": out, **rest}


def pipeline_to_scan_params(params: dict) -> dict:
    """Pipeline param tree -> plain-scan layout (stage axis folded back)."""
    out = dict(params["params"])
    for name in _TRUNKS:
        if name not in out or "pipe" not in out[name]:
            continue
        sub = flax.traverse_util.flatten_dict(
            out[name]["pipe"]["stages"]["blocks"]
        )
        sub = {
            k: v.reshape(v.shape[0] * v.shape[1], *v.shape[2:])
            for k, v in sub.items()
        }
        out[name] = flax.traverse_util.unflatten_dict(sub)
    rest = {k: v for k, v in params.items() if k != "params"}
    return {"params": out, **rest}
