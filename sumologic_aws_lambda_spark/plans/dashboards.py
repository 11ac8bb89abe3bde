"""Dashboards: panel definitions compiled to DataFrame plans.

The reference's API client exposes the dashboard surface —
``sumologic-app-utils/src/sumologic.py:172-183`` (``dashboards()``,
``dashboard(id)``, ``dashboard_data(id)`` returning per-panel evaluated
results) — and the content packs it installs carry dashboards the
installer previously ignored.  This module is the analytics analog: a
dashboard is a named set of panels, each panel a SumoQL query plus
display metadata; "data" for a dashboard is the dict of evaluated panel
frames.

Export shape handled (the public content sync-definition):
``DashboardV2SyncDefinition`` (and the legacy ``Dashboard``/
``MewboardSyncDefinition`` spellings) with ``panels[]``, each panel
carrying ``queries[{queryString}]`` (first query wins — panel overlays
share an axis, not a plan) and ``visualSettings``/``panelType``.

Scale stance: a dashboard is metadata; evaluation inherits the
compiler's physical plans.  Panels backed by scheduled views read
pre-aggregated slices (``back_with_views``) — the Sumo pattern for
keeping dashboard latency flat as the fact table grows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .scheduled_views import ScheduledViewSpec, ScheduledViewStore
from .sumoql import SumoQLError, SumoSchema, compile_query


class DashboardError(ValueError):
    pass


@dataclass(frozen=True)
class Panel:
    key: str
    title: str
    query_text: str
    panel_type: str = "SumoSearchPanel"


@dataclass
class Dashboard:
    name: str
    panels: list[Panel] = field(default_factory=list)

    @classmethod
    def from_node(cls, node: dict) -> "Dashboard":
        """Parse one dashboard node of a content export."""
        panels: list[Panel] = []
        for i, p in enumerate(node.get("panels", []) or []):
            queries = p.get("queries") or []
            qtext = None
            for q in queries:
                qtext = q.get("queryString") or q.get("queryText")
                if qtext:
                    break
            # the legacy DashboardSyncDefinition format puts queryString
            # directly on the panel, not under queries[]
            if not qtext:
                qtext = p.get("queryString") or p.get("queryText")
            if not qtext:
                # query-less panels are routine (TextPanel headers in
                # DashboardV2 exports) — skip the panel, never fail the
                # dashboard: one text header must not drop nine
                # compilable search panels from a pack install.
                if "text" in str(p.get("panelType", "")).lower():
                    continue
                raise DashboardError(
                    f"panel {p.get('title', i)!r} has no query")
            panels.append(Panel(
                key=str(p.get("key", f"panel-{i}")),
                title=p.get("title", f"panel-{i}"),
                query_text=qtext,
                panel_type=p.get("panelType", "SumoSearchPanel"),
            ))
        if not panels:
            raise DashboardError(
                f"dashboard {node.get('name')!r} has no panels")
        return cls(name=node.get("name") or "dashboard", panels=panels)

    @classmethod
    def from_json(cls, text: str) -> "Dashboard":
        try:
            return cls.from_node(json.loads(text))
        except json.JSONDecodeError as exc:
            raise DashboardError(f"bad dashboard JSON: {exc}") from exc


class DashboardService:
    """The ``/dashboards`` surface over compiled plans
    (``sumologic.py:172-183``): register, list, fetch, evaluate."""

    def __init__(self) -> None:
        self._dashboards: dict[str, Dashboard] = {}

    def register(self, dash: Dashboard) -> None:
        self._dashboards[dash.name] = dash

    def dashboards(self) -> list[str]:
        return sorted(self._dashboards)

    def dashboard(self, name: str) -> Dashboard:
        try:
            return self._dashboards[name]
        except KeyError:
            raise DashboardError(f"unknown dashboard {name!r}") from None

    def dashboard_data(self, name: str, df: DataFrame,
                       schema: SumoSchema = SumoSchema(),
                       lookups: dict[str, DataFrame] | None = None,
                       ) -> dict[str, DataFrame]:
        """Evaluate every panel against a bound source — the analog of
        ``dashboard_data(id)``'s per-panel result list.  Panels share
        the source scan; each value is a lazy plan the caller collects."""
        dash = self.dashboard(name)
        out: dict[str, DataFrame] = {}
        for p in dash.panels:
            try:
                out[p.key] = compile_query(df, p.query_text, schema,
                                           lookups=lookups)
            except SumoQLError as exc:
                raise DashboardError(
                    f"panel {p.title!r} failed to compile: {exc}") from exc
        return out

    def back_with_views(self, name: str, store: ScheduledViewStore,
                        df: DataFrame,
                        schema: SumoSchema = SumoSchema()) -> dict[str, str]:
        """Backfill every view-shaped panel (timeslice + mergeable
        aggregates) into ``store``; returns {panel_key: view_name} for
        the panels that qualified.  Non-conforming panels are skipped —
        they keep reading the source directly."""
        from .scheduled_views import view_safe_name

        dash = self.dashboard(name)
        backed: dict[str, str] = {}
        for p in dash.panels:
            view_name = view_safe_name(dash.name, p.key)
            try:
                store.backfill(df, ScheduledViewSpec(
                    name=view_name, query=p.query_text), schema)
            except SumoQLError:
                continue
            backed[p.key] = view_name
        return backed
