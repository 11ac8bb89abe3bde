"""Provisioning catalog: collectors, sources, fields — the surface of
``sumologic-app-utils`` (SURVEY §1.1 'catalog objects').

Reference semantics (``sumologic-app-utils/src/sumoresource.py``):

- Collector create is create-or-fetch by name (:78-120) — idempotent.
- Source carries the ingest contract (:247-380): ``category``, ``fields``
  map, processing-rule ``filters`` (:277-281, blank regexps dropped),
  ``multilineProcessingEnabled`` / ``useAutolineMatching`` (:287-291),
  ``cutoffTimestamp`` = now − 24 h (:293-294), polling sources add
  ``pathExpression`` + ``scanInterval`` (default 300000 ms, :319).
- HTTP sources force multiline off when ``messagePerRequest`` (:433-435).

Spark-first: the catalog is plain data + a JSON file (no service); its
value is ``source_read_options`` / ``source_trigger`` — the bridge that
turns a provisioned source into the exact ``readStream`` options and
trigger the streaming shell uses, and ``source_filters`` into the
F9 include/exclude Column predicate applied at ingest.
"""

from __future__ import annotations

import csv
import io
import json
import pathlib
import re
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SCAN_INTERVAL_MS = 300_000          # sumoresource.py:319
DEFAULT_CUTOFF_HOURS = 24                   # sumoresource.py:293-294


@dataclass
class Collector:
    name: str
    description: str = ""
    category: str = ""
    collector_id: str = ""


@dataclass
class Source:
    name: str
    collector_id: str
    category: str = ""
    source_type: str = "http"               # http | s3 | cwl
    fields: dict[str, str] = field(default_factory=dict)
    filters: list[dict] = field(default_factory=list)
    multiline_enabled: bool = False
    use_autoline_matching: bool = True
    message_per_request: bool = False
    path_expression: str = ""
    scan_interval_ms: int = DEFAULT_SCAN_INTERVAL_MS
    cutoff_hours: int = DEFAULT_CUTOFF_HOURS
    source_id: str = ""

    def __post_init__(self) -> None:
        # HTTP source forces multiline off when per-request (:433-435)
        if self.message_per_request:
            self.multiline_enabled = False
        # blank regexps dropped (:277-281)
        self.filters = [
            f for f in self.filters if f.get("regexp", "").strip()
        ]


@dataclass
class OrgField:
    """One org-level fields-schema entry (``sumoresource.py:1351``
    ``SumoLogicFieldsSchema``).  In Sumo, a field key must exist in the
    org schema for its values to be ingested; a disabled field's values
    are dropped at ingest but the key is reserved."""

    field_name: str
    field_id: str = ""
    enabled: bool = True


class CatalogStore:
    """Create-or-fetch catalog with optional JSON persistence."""

    def __init__(self, path: str | None = None):
        self._path = pathlib.Path(path) if path else None
        self._collectors: dict[str, Collector] = {}
        self._sources: dict[str, Source] = {}
        self._fields: dict[str, OrgField] = {}
        self._connections: dict[str, object] = {}
        if self._path and self._path.exists():
            self._load()

    # -- collectors (create-or-fetch by name, :78-120) --------------------

    def create_collector(self, name: str, **kwargs) -> Collector:
        for c in self._collectors.values():
            if c.name == name:
                return c
        c = Collector(name=name, collector_id=uuid.uuid4().hex[:12], **kwargs)
        self._collectors[c.collector_id] = c
        self._save()
        return c

    def delete_collector(self, collector_id: str) -> None:
        if any(s.collector_id == collector_id for s in self._sources.values()):
            raise ValueError("collector still has sources")
        self._collectors.pop(collector_id, None)
        self._save()

    # -- sources ----------------------------------------------------------

    def create_source(self, collector_id: str, name: str, **kwargs) -> Source:
        if collector_id not in self._collectors:
            raise KeyError(f"no such collector {collector_id!r}")
        for s in self._sources.values():
            if s.collector_id == collector_id and s.name == name:
                return s
        s = Source(name=name, collector_id=collector_id,
                   source_id=uuid.uuid4().hex[:12], **kwargs)
        self._sources[s.source_id] = s
        self._save()
        return s

    def update_source(self, source_id: str, **updates) -> Source:
        s = self._sources[source_id]
        for k, v in updates.items():
            if not hasattr(s, k):
                raise AttributeError(f"source has no field {k!r}")
            setattr(s, k, v)
        s.__post_init__()
        self._save()
        return s

    def delete_source(self, source_id: str) -> None:
        self._sources.pop(source_id, None)
        self._save()

    def sources_for(self, collector_id: str) -> list[Source]:
        return [s for s in self._sources.values()
                if s.collector_id == collector_id]

    # -- webhook connections (sumoresource.py:161) -------------------------

    def create_connection(self, name: str, url: str, **kwargs):
        """Create-or-fetch by name: the reference maps the
        ``connection:name_already_exists`` API error back to the existing
        connection's id (``sumoresource.py:197-204``)."""
        from .streaming.webhook import WebhookConnection

        for c in self._connections.values():
            if c.name == name:
                return c
        c = WebhookConnection(name=name, url=url,
                              connection_id=uuid.uuid4().hex[:12], **kwargs)
        self._connections[c.connection_id] = c
        self._save()
        return c

    def update_connection(self, connection_id: str, **updates):
        c = self._connections[connection_id]
        for k, v in updates.items():
            if not hasattr(c, k):
                raise AttributeError(f"connection has no field {k!r}")
            setattr(c, k, v)
        self._save()
        return c

    def delete_connection(self, connection_id: str) -> None:
        self._connections.pop(connection_id, None)
        self._save()

    def connections(self) -> list:
        return sorted(self._connections.values(), key=lambda c: c.name)

    # -- org-level fields schema (sumoresource.py:1041,1351) ---------------

    def create_field(self, field_name: str) -> OrgField:
        """Create-or-fetch by name: the reference maps the
        ``field:already_exists`` API error to a lookup of the existing
        field's id (``sumoresource.py:1369-1378``)."""
        for f in self._fields.values():
            if f.field_name == field_name:
                return f
        f = OrgField(field_name=field_name, field_id=uuid.uuid4().hex[:12])
        self._fields[f.field_id] = f
        self._save()
        return f

    def get_field_id(self, field_name: str) -> str:
        """Lookup by name, raising when absent (``:1353-1360``)."""
        for f in self._fields.values():
            if f.field_name == field_name:
                return f.field_id
        raise KeyError(f"field name {field_name!r} not found")

    def set_field_enabled(self, field_id: str, enabled: bool) -> OrgField:
        f = self._fields[field_id]
        f.enabled = enabled
        self._save()
        return f

    def rename_field(self, field_id: str, new_name: str) -> OrgField:
        """There is no update API: a rename is create-new + delete-old
        (``sumoresource.py:1386-1390``), so the renamed field gets a NEW
        id and the old id stops resolving."""
        old = self._fields.pop(field_id)
        self._save()
        new = self.create_field(new_name)
        new.enabled = old.enabled
        self._save()
        return new

    def delete_field(self, field_id: str) -> None:
        self._fields.pop(field_id, None)
        self._save()

    def org_fields(self) -> list[OrgField]:
        return sorted(self._fields.values(), key=lambda f: f.field_name)

    def fields_schema_filter(self, attrs_col: str = "attrs") -> Column:
        """The ingest-side dropped-fields semantics as ONE Column: keep
        only map entries whose key is a registered, enabled org field —
        everything else is dropped at ingest, exactly what the backend
        does for keys missing from the org fields schema.  The schema is
        dimension-sized (hundreds of names), so it rides along as a map
        literal — fully narrow, no join, no UDF."""
        allowed = sorted(
            f.field_name for f in self._fields.values() if f.enabled)
        if not allowed:
            return F.map_filter(F.col(attrs_col), lambda k, v: F.lit(False))
        allowed_arr = F.array(*[F.lit(n) for n in allowed])
        return F.map_filter(
            F.col(attrs_col),
            lambda k, v: F.array_contains(allowed_arr, k),
        )

    # -- bulk field apply (sumoresource.py:1231
    #    AddFieldsInHostMetricsSources) ------------------------------------

    def add_fields_in_matching_sources(
            self, instance_ids: list[str],
            new_fields: dict[str, str] | None,
            old_fields: dict[str, str] | None = None,
            source_type: str = "hostmetrics",
            instance_key: str = "InstanceId",
            batch_size: int = 10) -> list[Source]:
        """Bulk field update across every source of ``source_type`` whose
        ``instance_key`` field matches one of ``instance_ids`` — the
        reference's ``add_remove_fields`` (``sumoresource.py:1274-1295``):
        instance ids are processed in chunks of ``batch_size``
        (``batch_size_chunking``, ``:1236-1240``), matching sources are
        located per chunk (the ``_contentType=HostMetrics (InstanceId=a
        or InstanceId=b) | count by _sourceId, _collectorId`` metric
        query, ``:1242-1271``), and each source's field map is updated in
        place: ``old_fields`` keys popped first, then ``new_fields``
        merged (``:1281-1290``).  Pass ``new_fields=None`` with
        ``old_fields`` set for the delete path (``:1317-1320``).
        Returns the updated sources."""
        updated: list[Source] = []
        for i in range(0, len(instance_ids), max(batch_size, 1)):
            chunk = set(instance_ids[i:i + max(batch_size, 1)])
            for s in self._sources.values():
                if s.source_type != source_type:
                    continue
                if s.fields.get(instance_key) not in chunk:
                    continue
                if old_fields:
                    for k in old_fields:
                        s.fields.pop(k, None)
                if new_fields:
                    s.fields.update(new_fields)
                updated.append(s)
        if updated:
            self._save()
        return updated

    # -- the engine bridge -------------------------------------------------

    @staticmethod
    def source_read_options(source: Source,
                            now_epoch: int | None = None) -> dict[str, str]:
        """Provisioned source → ``readStream`` options (S11):
        pathExpression → ``pathGlobFilter``, cutoff → ``modifiedAfter``,
        multiline flags → text-source line assembly mode."""
        opts: dict[str, str] = {}
        if source.path_expression:
            opts["pathGlobFilter"] = source.path_expression
        if now_epoch is not None:
            import datetime as _dt

            cutoff = _dt.datetime.fromtimestamp(
                now_epoch - source.cutoff_hours * 3600, _dt.timezone.utc
            )
            # Explicit Z: Spark parses a zone-less modifiedAfter in the
            # SESSION timezone, which would shift the cutoff window by
            # the cluster offset (silently excluding up to a day of
            # files on a non-UTC cluster).
            opts["modifiedAfter"] = cutoff.strftime("%Y-%m-%dT%H:%M:%SZ")
        if source.multiline_enabled:
            # BOTH multiline modes need whole-object reads: autoline
            # matching (the Sumo default, sumoresource.py:287-291) folds
            # lines with the default boundary regex, a custom expression
            # supplies its own — either way the assembly stage consumes
            # a wholetext 'content' column, and a line-wise read would
            # silently emit one record per line.
            opts["wholetext"] = "true"
        return opts

    @staticmethod
    def source_trigger(source: Source) -> str:
        """scanInterval → ``Trigger.ProcessingTime`` string (T1)."""
        return f"{max(1, source.scan_interval_ms // 1000)} seconds"

    @staticmethod
    def source_filter_predicate(source: Source,
                                message_col: str = "message") -> Column:
        """F9 processing rules → one Column predicate: Include rules OR
        together (a row must match some include if any exist); Exclude
        rules drop matches."""
        includes = [f["regexp"] for f in source.filters
                    if f.get("filterType") == "Include"]
        excludes = [f["regexp"] for f in source.filters
                    if f.get("filterType") == "Exclude"]
        pred = F.lit(True)
        if includes:
            inc = F.lit(False)
            for rx in includes:
                inc = inc | F.col(message_col).rlike(rx)
            pred = pred & inc
        for rx in excludes:
            pred = pred & ~F.col(message_col).rlike(rx)
        return pred

    @staticmethod
    def source_mask_transform(source: Source,
                              message_col: str = "message") -> Column:
        """The other two processing-rule types of the same F9 surface
        (public Sumo processing rules: Exclude / Include / Hash / Mask —
        the reference provisions the filter list verbatim,
        ``sumoresource.py:277-281``): ``Mask`` rules replace every
        regex match with the rule's ``mask`` string; ``Hash`` rules
        replace every match with a hash of the matched value (md5 here —
        the engine-wide hash convention), so equal values stay joinable
        after redaction.  Rules apply in list order.

        Spark-first, both all-narrow (no UDF, no shuffle).  Mask is a
        ``regexp_replace`` with the mask escaped as a LITERAL
        replacement (a user mask containing ``$`` or ``\\`` must not be
        read as a group reference).  Hash must replace each true regex
        MATCH — a literal search-and-replace of the matched values
        would also rewrite equal substrings the regex never matched
        (boundary-anchored rules, matches nested in longer matches) —
        so matches are sentinel-wrapped in one ``regexp_replace``
        (NUL delimiters, absent from any sane log line), the message
        splits into match/non-match segments, and only segments that
        FULLY match the rule regex are hashed before rejoining."""
        col = F.col(message_col)
        for f in source.filters:
            ftype = f.get("filterType")
            if ftype == "Mask":
                literal_mask = (f.get("mask", "#####")
                                .replace("\\", "\\\\").replace("$", r"\$"))
                col = F.regexp_replace(col, f["regexp"], literal_mask)
            elif ftype == "Hash":
                rx = f["regexp"]
                wrapped = F.regexp_replace(col, rx, "\x00$0\x00")
                segs = F.split(wrapped, "\x00")
                col = F.array_join(
                    F.transform(
                        segs,
                        lambda s: F.when(s.rlike(f"^(?:{rx})$"), F.md5(s))
                        .otherwise(s)),
                    "")
        return col

    # -- persistence -------------------------------------------------------

    def _save(self) -> None:
        if not self._path:
            return
        self._path.write_text(json.dumps({
            "collectors": [asdict(c) for c in self._collectors.values()],
            "sources": [asdict(s) for s in self._sources.values()],
            "fields": [asdict(f) for f in self._fields.values()],
            "connections": [asdict(c) for c in self._connections.values()],
        }, indent=2))

    def _load(self) -> None:
        data = json.loads(self._path.read_text())
        for c in data.get("collectors", []):
            col = Collector(**c)
            self._collectors[col.collector_id] = col
        for s in data.get("sources", []):
            src = Source(**s)
            self._sources[src.source_id] = src
        for f in data.get("fields", []):
            fld = OrgField(**f)
            self._fields[fld.field_id] = fld
        if data.get("connections"):
            from .streaming.webhook import WebhookConnection

            for c in data["connections"]:
                conn = WebhookConnection(**c)
                self._connections[conn.connection_id] = conn


# ---------------------------------------------------------------------------
# Account-metadata scalars (sumoresource.py:1427,1452)
# ---------------------------------------------------------------------------

_ALIAS_OK = re.compile(r"[a-z0-9]+$")


def account_alias(account_id: str,
                  mapping_csv: str | None = None,
                  fallback_alias: str | None = None) -> dict[str, str]:
    """``AccountAlias`` resolution (``sumoresource.py:1452-1483``): look
    the account up in an ``account_id,alias`` CSV mapping; an alias is
    accepted only if it is <= 30 chars and passes the reference's
    ``re.search(r'[a-z0-9]+$')`` probe (``:1466`` — a SUFFIX search,
    deliberately mirrored here including its leniency: ``Prod9``
    passes because ``rod9`` anchors the end, while a non-alnum tail
    fails).  Fallback chain on miss / unreadable mapping: the
    explicit ``fallback_alias``, else the account id itself — the
    reference never fails the stack over an alias."""
    if mapping_csv is not None:
        try:
            for row in csv.reader(io.StringIO(mapping_csv)):
                if len(row) >= 2 and row[0] == account_id and row[1]:
                    alias = row[1]
                    if len(alias) <= 30 and _ALIAS_OK.search(alias):
                        return {"ACCOUNT_ALIAS": alias}
        except csv.Error:
            pass
        if fallback_alias:
            return {"ACCOUNT_ALIAS": fallback_alias}
        return {"ACCOUNT_ALIAS": account_id}
    if fallback_alias:
        return {"ACCOUNT_ALIAS": fallback_alias}
    return {"ACCOUNT_ALIAS": account_id}


def enterprise_or_trial_check(is_enterprise: bool,
                              app_count: int) -> dict[str, str]:
    """``EnterpriseOrTrialAccountCheck`` (``sumoresource.py:1427-1438``):
    an account is "paid" unless it is neither enterprise nor carries
    more than five installed apps (the reference's free-trial
    heuristic)."""
    is_paid = "Yes"
    if not is_enterprise and app_count <= 5:
        is_paid = "No"
    return {"is_enterprise": "Yes" if is_enterprise else "No",
            "is_paid": is_paid}
