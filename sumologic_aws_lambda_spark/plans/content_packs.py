"""Content packs: install an exported app's saved searches and run them.

The reference's ``App`` custom resource downloads an ApiExported content
JSON, substitutes ``$$param`` placeholders, creates/uses the app folder
(upserting on ``content:duplicate_content``), and imports the folder tree
of saved searches into the org (``sumologic-app-utils/src/
sumoresource.py:543-609``; the export format is the public Sumo content
sync-definition: ``FolderSyncDefinition`` nodes with ``children``,
``SavedSearchWithScheduleSyncDefinition`` leaves carrying
``search.queryText``).

Here the install target is a session-scoped catalog instead of a SaaS
folder API, and "running" a saved search compiles its queryText through
the SumoQL compiler (``plans/sumoql.py``) into a DataFrame plan — so a
pack is a distributable bundle of queries a user installs once and runs
against any bound source.

Scale stance: installation touches only pack metadata (pure driver-side
dict work, no Spark job); execution inherits the compiler's physical
plans, so nothing here adds a shuffle or a collect.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .sumoql import SumoQLError, SumoSchema, compile_query


class ContentPackError(ValueError):
    pass


@dataclass
class SavedSearch:
    """One exported saved search (queryText + metadata)."""

    name: str
    query_text: str
    description: str = ""
    # Sumo exports carry the search's default time range; kept verbatim.
    time_range: dict | None = None


@dataclass
class ContentPack:
    """A parsed export: the app folder's name/description, its saved
    searches (flattened to ``folder/sub-folder/name`` paths), and its
    dashboards (``plans/dashboards.py`` — panels compiled on demand)."""

    name: str
    description: str = ""
    searches: dict[str, SavedSearch] = field(default_factory=dict)
    dashboards: dict[str, object] = field(default_factory=dict)

    @classmethod
    def from_json(cls, text: str,
                  params: dict[str, str] | None = None) -> "ContentPack":
        """Parse an ApiExported content JSON.

        ``params`` substitutes ``$$key`` placeholders in the RAW text
        before parsing — byte-for-byte the reference's
        ``_replace_source_category`` contract (``sumoresource.py:552``):
        the export embeds ``$$logsrc``-style markers inside queryText
        strings, and substitution happens before JSON decoding.
        """
        if params:
            # longest key first: with plain replace, a key that prefixes
            # another ("logsrc" vs "logsrcExt") would corrupt the longer
            # marker into "<value>Ext" and slip past the unsubstituted-
            # marker guard below.  A regex with a \w boundary enforces
            # whole-marker matches regardless of dict order.
            for k in sorted(params, key=len, reverse=True):
                # callable repl: the VALUE must be spliced verbatim, not
                # run through re.sub's \-escape processing
                text = re.sub(rf"\$\${re.escape(k)}(?!\w)",
                              lambda m, _v=params[k]: _v, text)
        if re.search(r"\$\$\w+", text):
            missing = sorted(set(re.findall(r"\$\$(\w+)", text)))
            raise ContentPackError(
                f"unsubstituted pack parameters: {missing}")
        try:
            root = json.loads(text)
        except json.JSONDecodeError as exc:
            raise ContentPackError(f"bad pack JSON: {exc}") from exc

        # `"description": null` is common in real exports — get()'s
        # default only covers a MISSING key, not an explicit null.
        pack = cls(name=root.get("name") or "pack",
                   description=(root.get("description") or "")[:255])
        pack._walk(root, prefix="", is_root=True)
        if not pack.searches and not pack.dashboards:
            raise ContentPackError(
                f"pack {pack.name!r} contains no saved searches or "
                "dashboards")
        return pack

    def _walk(self, node: dict, prefix: str, is_root: bool) -> None:
        ntype = node.get("type", "")
        if ntype.startswith("SavedSearch"):
            name = node.get("name", "unnamed")
            search = node.get("search", {})
            qt = search.get("queryText")
            if not qt:
                raise ContentPackError(f"saved search {name!r} has no "
                                       "queryText")
            tr = search.get("defaultTimeRange")
            self.searches[f"{prefix}{name}"] = SavedSearch(
                name=name,
                query_text=qt,
                # `or ""`: an explicit JSON null must normalize like the
                # pack-level description two branches up
                description=node.get("description") or "",
                time_range=tr if isinstance(tr, dict) else None,
            )
        elif "Dashboard" in ntype or "Mewboard" in ntype:
            from .dashboards import Dashboard, DashboardError

            name = node.get("name", "unnamed")
            try:
                self.dashboards[f"{prefix}{name}"] = Dashboard.from_node(node)
            except DashboardError:
                # Real exports carry dashboard variants this model can't
                # compile (panel-less boards, metrics-only panels) —
                # install the rest of the pack rather than aborting,
                # matching the previous ignore-all-dashboards behavior
                # for exactly the nodes that don't parse.
                pass
        elif ntype.startswith("Folder") or "children" in node:
            # The ROOT folder's name is the pack name, not a path
            # component — matches the reference, which creates the app
            # folder itself at the install root; nested folders become
            # path segments.
            sub = node.get("name", "")
            child_prefix = prefix if is_root or not sub \
                else f"{prefix}{sub}/"
            for child in node.get("children", []):
                self._walk(child, child_prefix, is_root=False)
        # Other content types (lookups-in-pack, metrics searches):
        # ignored — no analytics-engine analog yet.


class ContentPackCatalog:
    """Session-scoped install target for content packs.

    ``install`` upserts: re-installing a pack with the same name replaces
    its searches (the reference maps ``content:duplicate_content`` to
    reusing the existing folder, then imports over it).
    """

    def __init__(self) -> None:
        self._packs: dict[str, ContentPack] = {}

    def install(self, pack: ContentPack) -> list[str]:
        """Install (or upsert) a pack; returns the installed paths."""
        self._packs[pack.name] = pack
        return sorted(pack.searches)

    def uninstall(self, name: str) -> None:
        self._packs.pop(name, None)

    def packs(self) -> list[str]:
        return sorted(self._packs)

    def search(self, pack: str, path: str) -> SavedSearch:
        try:
            p = self._packs[pack]
        except KeyError:
            raise ContentPackError(f"pack not installed: {pack!r}")
        try:
            return p.searches[path]
        except KeyError:
            raise ContentPackError(
                f"no saved search {path!r} in pack {pack!r} "
                f"(has: {sorted(p.searches)})")

    def run(self, df: DataFrame, pack: str, path: str, schema: SumoSchema,
            lookups: dict[str, DataFrame] | None = None) -> DataFrame:
        """Compile a pack's saved search against a bound source frame."""
        s = self.search(pack, path)
        try:
            return compile_query(df, s.query_text, schema, lookups=lookups)
        except SumoQLError as exc:
            raise ContentPackError(
                f"saved search {path!r} failed to compile: {exc}") from exc

    def schedule(self, store, df: DataFrame, pack: str, path: str,
                 schema: SumoSchema, view_name: str | None = None) -> str:
        """Materialize a pack's saved search as a scheduled view: backfill
        it into ``store`` (a ``ScheduledViewStore``) so the pack's
        dashboard panels read pre-aggregated slices instead of re-scanning
        the source (the Sumo pattern of backing installed-app dashboards
        with scheduled views).  The search must fit the view contract —
        timeslice key + mergeable aggregates — or this raises with the
        view layer's explanation.  Returns the view name (derived
        ``<pack>_<search>`` unless given)."""
        from .scheduled_views import ScheduledViewSpec, view_safe_name

        s = self.search(pack, path)
        name = view_name or view_safe_name(pack, s.name)
        try:
            spec = ScheduledViewSpec(name=name, query=s.query_text)
            store.backfill(df, spec, schema)
        except SumoQLError as exc:
            raise ContentPackError(
                f"saved search {path!r} cannot back a scheduled view: "
                f"{exc}") from exc
        return name


# ---------------------------------------------------------------------------
# Content folder tree: copy / admin-mode import (sumologic.py:204-254)
# ---------------------------------------------------------------------------

@dataclass
class ContentFolder:
    """One folder node of the v2 content API (``sumologic.py:207-227``):
    id, name, description, parentId, plus children (sub-folders and
    saved-search leaves)."""

    name: str
    description: str = ""
    parent_id: str = ""
    folder_id: str = ""
    folders: dict[str, "ContentFolder"] = field(default_factory=dict)
    searches: dict[str, SavedSearch] = field(default_factory=dict)


class ContentFolderStore:
    """The content-folder half of the reference client
    (``sumologic.py:204-254``): personal and admin-recommended roots,
    folder CRUD gated by ``isAdminMode`` for anything under the admin
    root, deep ``copy_folder`` with full id-remapping, and
    import-into-folder with the ``overwrite`` flag — each async API
    (copy, import) returning a job id whose status is polled, matching
    the reference's check_copy_status / check_import_status loops."""

    def __init__(self) -> None:
        self._personal = ContentFolder(
            name="Personal", folder_id="personal-root")
        self._admin = ContentFolder(
            name="Admin Recommended", folder_id="admin-root")
        self._by_id: dict[str, ContentFolder] = {
            "personal-root": self._personal, "admin-root": self._admin}
        self._jobs: dict[str, dict] = {}

    # -- lookup ------------------------------------------------------------

    def get_personal_folder(self) -> ContentFolder:
        return self._personal

    def get_admin_recommended_folder(self) -> ContentFolder:
        return self._admin

    def _under_admin(self, folder: ContentFolder) -> bool:
        while folder is not None:
            if folder.folder_id == "admin-root":
                return True
            folder = self._by_id.get(folder.parent_id)
        return False

    def _check_admin(self, folder: ContentFolder, is_admin: bool) -> None:
        """The ``isAdminMode`` header contract: content under the Admin
        Recommended root is writable only in admin mode."""
        if self._under_admin(folder) and not is_admin:
            raise ContentPackError(
                f"folder {folder.name!r} is under Admin Recommended — "
                "pass is_admin=True (the isAdminMode header)")

    def get_folder_by_id(self, folder_id: str,
                         is_admin: bool = False) -> ContentFolder:
        try:
            f = self._by_id[folder_id]
        except KeyError:
            raise ContentPackError(f"no folder {folder_id!r}")
        if f.folder_id == "admin-root" or self._under_admin(f):
            if not is_admin:
                raise ContentPackError(
                    "admin-recommended content requires is_admin=True")
        return f

    # -- CRUD ----------------------------------------------------------------

    def create_folder(self, name: str, description: str,
                      parent_folder_id: str,
                      is_admin: bool = False) -> ContentFolder:
        parent = self._by_id.get(parent_folder_id)
        if parent is None:
            raise ContentPackError(f"no folder {parent_folder_id!r}")
        self._check_admin(parent, is_admin)
        if name in parent.folders:
            raise ContentPackError(
                f"content:duplicate_content — folder {name!r} exists "
                f"in {parent.name!r}")
        f = ContentFolder(name=name, description=description,
                          parent_id=parent_folder_id,
                          folder_id=uuid.uuid4().hex[:12])
        parent.folders[name] = f
        self._by_id[f.folder_id] = f
        return f

    def update_folder_by_id(self, folder_id: str, name: str | None = None,
                            description: str | None = None,
                            is_admin: bool = False) -> ContentFolder:
        f = self._by_id.get(folder_id)
        if f is None:
            raise ContentPackError(f"no folder {folder_id!r}")
        self._check_admin(f, is_admin)
        parent = self._by_id.get(f.parent_id)
        if name is not None and name != f.name and parent is not None:
            if name in parent.folders:
                raise ContentPackError(
                    f"content:duplicate_content — folder {name!r}")
            parent.folders.pop(f.name, None)
            f.name = name
            parent.folders[name] = f
        if description is not None:
            f.description = description
        return f

    def delete_folder(self, folder_id: str, is_admin: bool = False) -> None:
        f = self._by_id.get(folder_id)
        if f is None:
            return
        self._check_admin(f, is_admin)
        parent = self._by_id.get(f.parent_id)
        if parent is not None:
            parent.folders.pop(f.name, None)
        for sub in list(f.folders.values()):
            self.delete_folder(sub.folder_id, is_admin=is_admin)
        self._by_id.pop(folder_id, None)

    # -- copy (async job, :229-232 / :244-245) -------------------------------

    def copy_folder(self, folder_id: str, destination_folder_id: str,
                    is_admin: bool = False) -> str:
        """Deep-copy ``folder_id`` under the destination with EVERY node
        remapped to a fresh id (the copy shares nothing with the
        original); the copy is renamed ``<name> (Copy)`` when the name
        already exists at the destination.  Returns the async job id —
        poll ``check_copy_status`` for the new folder id."""
        src = self._by_id.get(folder_id)
        dst = self._by_id.get(destination_folder_id)
        if src is None or dst is None:
            raise ContentPackError("no such source/destination folder")
        # Both sides gate: copying admin-recommended content READS it,
        # so a non-admin caller must not be able to clone the admin
        # tree into a folder it can read (round-7 review finding).
        self._check_admin(src, is_admin)
        self._check_admin(dst, is_admin)

        def clone(node: ContentFolder, parent_id: str,
                  name: str) -> ContentFolder:
            c = ContentFolder(name=name, description=node.description,
                              parent_id=parent_id,
                              folder_id=uuid.uuid4().hex[:12])
            self._by_id[c.folder_id] = c
            for s in node.searches.values():
                c.searches[s.name] = SavedSearch(
                    name=s.name, query_text=s.query_text,
                    description=s.description,
                    # dict copied — "the copy shares nothing"
                    time_range=dict(s.time_range)
                    if s.time_range is not None else None)
            for sub in node.folders.values():
                c.folders[sub.name] = clone(sub, c.folder_id, sub.name)
            return c

        name = src.name if src.name not in dst.folders \
            else f"{src.name} (Copy)"
        copied = clone(src, dst.folder_id, name)
        dst.folders[name] = copied
        job_id = uuid.uuid4().hex[:12]
        self._jobs[job_id] = {"status": "Success",
                              "newFolderId": copied.folder_id}
        return job_id

    def check_copy_status(self, folder_id: str, job_id: str) -> dict:
        return self._jobs.get(job_id, {"status": "NotFound"})

    # -- import (async job, :234-241) ----------------------------------------

    def import_content(self, folder_id: str, content: str | dict,
                       is_overwrite: bool = False,
                       is_admin: bool = False) -> str:
        """Import a sync-definition tree (the ContentPack export format)
        under ``folder_id``.  With ``is_overwrite=False`` a name clash
        fails the job with ``content:duplicate_content`` (the error the
        reference's App resource recovers from by switching to
        overwrite); with ``True`` the existing child is replaced."""
        f = self._by_id.get(folder_id)
        if f is None:
            raise ContentPackError(f"no folder {folder_id!r}")
        self._check_admin(f, is_admin)
        pack = ContentPack.from_json(
            content if isinstance(content, str) else json.dumps(content))
        job_id = uuid.uuid4().hex[:12]
        if not is_overwrite and pack.name in f.folders:
            self._jobs[job_id] = {
                "status": "Failed",
                "error": f"content:duplicate_content — {pack.name!r}"}
            return job_id
        old = f.folders.get(pack.name)
        if old is not None:
            self.delete_folder(old.folder_id, is_admin=is_admin)
        imported = self.create_folder(
            pack.name, pack.description, folder_id, is_admin=is_admin)
        for path, s in pack.searches.items():
            node = imported
            parts = path.split("/")
            for seg in parts[:-1]:
                node = node.folders.get(seg) or self.create_folder(
                    seg, "", node.folder_id, is_admin=is_admin)
            node.searches[s.name] = s
        self._jobs[job_id] = {"status": "Success",
                              "folderId": imported.folder_id}
        return job_id

    def check_import_status(self, folder_id: str, job_id: str,
                            is_admin: bool = False) -> dict:
        return self._jobs.get(job_id, {"status": "NotFound"})
