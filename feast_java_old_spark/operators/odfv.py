"""On-Demand Feature Views (ODFV) — request-time transforms (SURVEY §2.7).

The reference executes these in an external Python service over
gRPC + Arrow IPC (``OnlineTransformationService.java:313-411``; only
INT32/INT64/FLOAT/DOUBLE inputs, :325-343). Spark's Python exchange *is*
Arrow, so the runner collapses to an in-process ``mapInPandas`` with the
same semantics:

DOCUMENTED DIVERGENCE (input types): the reference REJECTS non-numeric
ODFV inputs with ``Status.INTERNAL`` ("type that is currently not
handled", :338-343) — an acknowledged ``// TODO: support all Feast
types`` limitation of its hand-rolled Arrow serializer, not a semantic
contract. This runner deliberately PASSES THROUGH every Spark-Arrow-
convertible input type (strings, arrays, binary, timestamps): Spark's
exchange already implements the full bridge the reference's TODO asks
for, and replicating the rejection would only re-introduce an
implementation gap. Pinned by
``tests/test_multimodal_odfv.py::test_odfv_accepts_non_numeric_inputs_documented_divergence``.

- inputs = retrieved features ⋈ entity rows ⋈ request-data columns
  (J4; assembled by the caller — typically the output of
  ``get_online_features`` with request-data columns carried through),
- the transform sees a pandas batch and returns output columns,
- only *requested* outputs are kept; helper inputs are dropped
  (J5; ``OnlineServingServiceV2.java:288-304``),
- transformed outputs get status PRESENT
  (``processTransformFeaturesResponse:185-310``).

An ODFV can also be declared as pure column expressions
(:func:`OnDemandFeatureView.from_expressions`), in which case it never
leaves the JVM — strictly better than the reference's RPC hop whenever
the transform is expressible in SQL.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class OnDemandFeatureView:
    """A named request-time transform.

    ``inputs``: feature references ("table:feature" → retrieved value
    columns) and/or request-data column names
    (``extractRequestDataFeatureNamesAndOnDemandFeatureInputs`` semantics,
    ``OnlineTransformationService.java:83-131``).
    """

    name: str
    inputs: list[str]
    output_schema: T.StructType
    transform: Callable[[pd.DataFrame], pd.DataFrame] | None = None
    expressions: dict[str, Column] = field(default_factory=dict)

    @classmethod
    def from_expressions(
        cls, name: str, inputs: list[str], exprs: dict[str, Column]
    ) -> "OnDemandFeatureView":
        return cls(name=name, inputs=inputs, output_schema=None, expressions=exprs)

    def output_names(self) -> list[str]:
        if self.expressions:
            return list(self.expressions)
        return [f.name for f in self.output_schema.fields]


def apply_odfv(
    df: DataFrame,
    view: OnDemandFeatureView,
    requested_outputs: list[str] | None = None,
    drop_helper_inputs: bool = True,
    input_aliases: dict[str, str] | None = None,
) -> DataFrame:
    """Run an ODFV over an assembled row batch.

    ``input_aliases`` maps declared input names (feature refs /
    request-data names) to actual columns of ``df`` (e.g.
    ``{"rides:trip_cost": "rides__trip_cost"}``).

    The pandas ``transform`` ALWAYS sees BARE feature names: a declared
    input ``"rides:trip_cost"`` arrives as column ``trip_cost``. That is
    the only transform-visible contract the reference defines — its
    serializer strips refs unconditionally before the wire ("The Python
    FTS does not expect full feature names",
    ``OnlineTransformationService.java:320-321``) — so the in-process
    runner and the external transformation service
    (``transport.transform_service``) present IDENTICAL frames to the
    same transform code, and toggling ``transform_port`` on
    ``transport.app.run_servers`` never changes what the transform sees.
    Two feature-ref inputs that collapse to the same bare name would be
    indistinguishable to the transform (the reference would emit a
    duplicate-named Arrow field); that is rejected here at apply time.
    """
    aliases = input_aliases or {}
    cols = {inp: aliases.get(inp, inp.replace(":", "__")) for inp in view.inputs}
    missing = [c for c in cols.values() if c not in df.columns]
    if missing:
        raise ValueError(f"ODFV {view.name!r} missing input columns: {missing}")
    bare = {inp: inp.rsplit(":", 1)[-1] for inp in view.inputs}
    # only the pandas-transform path sees bare names; expression views
    # reference the aliased full columns directly and stay legal with
    # colliding bare names.
    if not view.expressions:
        dupes = {b for b in bare.values() if list(bare.values()).count(b) > 1}
        if dupes:
            raise ValueError(
                f"ODFV {view.name!r} inputs collide on bare feature names "
                f"{sorted(dupes)} — the transform receives bare names "
                "(OnlineTransformationService.java:320-321), so these would "
                "be indistinguishable"
            )

    outputs = view.output_names()
    requested = requested_outputs if requested_outputs is not None else outputs
    unknown = set(requested) - set(outputs)
    if unknown:
        raise ValueError(f"ODFV {view.name!r} does not produce {sorted(unknown)}")

    if view.expressions:
        out = df
        for name in requested:
            out = out.withColumn(name, view.expressions[name])
    else:
        passthrough = [f for f in df.schema.fields if f.name not in outputs]
        result_schema = T.StructType(
            passthrough + [f for f in view.output_schema.fields]
        )
        transform, rename = view.transform, cols

        bare_names = [bare[inp] for inp in rename]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ins = pdf[list(rename.values())].copy()
                # bare names, exactly what the external transformation
                # service's serializer would deliver (:320-321).
                ins.columns = bare_names
                res = transform(ins)
                keep = pdf[[f.name for f in passthrough]].reset_index(drop=True)
                yield pd.concat([keep, res.reset_index(drop=True)], axis=1)

        out = df.mapInPandas(run, result_schema)

    # Statuses: transformed outputs are PRESENT
    # (processTransformFeaturesResponse sets all statuses PRESENT).
    for name in requested:
        out = out.withColumn(f"{name}__status", F.lit("PRESENT"))

    drop_cols = [name for name in outputs if name not in requested]
    if drop_helper_inputs:
        drop_cols += [
            c
            for inp, c in cols.items()
            if ":" in inp  # helper *feature* inputs; request data stays
        ]
    return out.drop(*drop_cols) if drop_cols else out
