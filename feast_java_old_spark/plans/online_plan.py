"""The full ``GetOnlineFeaturesV2`` lifecycle (SURVEY §3.1) as one plan.

Mirrors ``OnlineServingServiceV2.getOnlineFeatures``
(``serving/src/main/java/feast/serving/service/OnlineServingServiceV2.java:82-320``):

1. split requested refs into regular vs on-demand (P2, :89-98),
2. expand ODFV inputs into extra feature refs + request-data column names
   (``OnlineTransformationService.extractRequestDataFeatureNamesAnd
   OnDemandFeatureInputs:83-131``),
3. separate entity fields vs request-data fields (P3, :116-123) —
   request-data columns ride along the entity-rows DataFrame,
4. retrieve regular + helper features (J1/J2/J3, broadcast plan),
5. run each ODFV over the assembled batch (J4; in-process Arrow instead
   of the reference's gRPC hop),
6. drop helper features that were not themselves requested (J5,
   :288-304); ODFV outputs get status PRESENT,
7. return rows in input order with value + status columns per requested
   feature.

Everything stays one lazy DataFrame — Catalyst fuses the retrieval joins
and expression-mode ODFVs into the same stage pipeline; only
pandas-transform ODFVs introduce an Arrow exchange.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from feast_java_old_spark.operators.odfv import OnDemandFeatureView, apply_odfv
from feast_java_old_spark.operators.retrieval import get_online_features
from feast_java_old_spark.registry.registry import Registry


def serve_online_features(
    spark: SparkSession,
    registry: Registry,
    entity_rows: Union[Sequence[dict], DataFrame],
    feature_refs: Sequence[str],
    store_path: Optional[str] = None,
    odfvs: Optional[dict[str, OnDemandFeatureView]] = None,
    project: str = "default",
    request_ts: Optional[dt.datetime] = None,
    online_frames: Optional[dict[str, DataFrame]] = None,
    transform_endpoint: Optional[str] = None,
) -> DataFrame:
    """Serve a mixed batch of regular and on-demand feature references.

    ODFV refs use the same ``"name:output"`` form; ``odfvs`` maps view
    name → :class:`OnDemandFeatureView`.

    ``transform_endpoint`` (``"host:port"``) routes pandas-transform
    ODFVs through an external transformation service over a real
    socket — the reference's deployment shape
    (``OnlineTransformationService.java:62-79``; the endpoint string is
    its ``transformationServiceEndpoint``). The local ``view.transform``
    is then ignored (the service owns the code); views declared as pure
    column expressions never leave the JVM either way. Every
    ``mapInPandas`` Arrow batch makes its own call from its executor —
    no driver round-trip, so the hop scales with the cluster.
    """
    odfvs = odfvs or {}

    # 1. P2: split refs.
    regular_refs: list[str] = []
    odfv_requests: dict[str, list[str]] = {}
    for ref in feature_refs:
        table, _, feat = ref.partition(":")
        if table in odfvs:
            odfv_requests.setdefault(table, []).append(feat)
        else:
            regular_refs.append(ref)

    # 2. Input expansion: helper feature refs + request-data names.
    helper_refs: list[str] = []
    request_data_cols: set[str] = set()
    for name in odfv_requests:
        for inp in odfvs[name].inputs:
            if ":" in inp:
                if inp not in regular_refs and inp not in helper_refs:
                    helper_refs.append(inp)
            else:
                request_data_cols.add(inp)

    # 3. P3: request-data columns must arrive with the entity rows.
    if isinstance(entity_rows, DataFrame):
        have = set(entity_rows.columns)
    elif len(entity_rows) > 0:
        have = set(entity_rows[0].keys())
    else:
        have = set()
    missing = request_data_cols - have
    if missing:
        raise ValueError(
            f"request data columns {sorted(missing)} missing from entity rows "
            "(OnlineTransformationService.separateEntityRows semantics)"
        )

    # 4. Retrieval of regular + helper features.
    all_refs = regular_refs + helper_refs
    if all_refs:
        out = get_online_features(
            spark,
            registry,
            entity_rows,
            all_refs,
            store_path=store_path,
            project=project,
            request_ts=request_ts,
            full_feature_names=True,
            online_frames=online_frames,
        )
    else:
        out = (
            entity_rows
            if isinstance(entity_rows, DataFrame)
            else spark.createDataFrame(list(entity_rows))
        )

    # 5./6. Run ODFVs; drop helpers that were not directly requested.
    for name, outputs in odfv_requests.items():
        view = odfvs[name]
        if transform_endpoint is not None and not view.expressions:
            from feast_java_old_spark.transport.transform_service import (
                service_transform,
            )

            view = OnDemandFeatureView(
                name=view.name,
                inputs=view.inputs,
                output_schema=view.output_schema,
                transform=service_transform(
                    transform_endpoint,
                    view.name,
                    view.output_names(),
                    project=project,
                ),
            )
        aliases = {
            inp: (inp.replace(":", "__") if ":" in inp else inp)
            for inp in view.inputs
        }
        out = apply_odfv(
            out,
            view,
            requested_outputs=outputs,
            drop_helper_inputs=False,
            input_aliases=aliases,
        )
    helper_only = [r for r in helper_refs if r not in regular_refs]
    drop_cols = []
    for r in helper_only:
        col = r.replace(":", "__")
        drop_cols += [col, f"{col}__status"]
    if drop_cols:
        out = out.drop(*drop_cols)
    return out
