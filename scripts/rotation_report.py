#!/usr/bin/env python
"""Driver-verification coverage report: for every registered query,
its latest CORRECTNESS_r*.json status and round, flagging rotation
debt (never driver-checked) and the current window contents.

Usage: python scripts/rotation_report.py [repo_dir] [--stale] [--census]

``--stale`` additionally computes, from git history, every query
whose IMPLEMENTING CODE changed after its last driver check — the
"stale-green" set that previous rounds assembled by hand — and
prints the mechanically-derived 50-slot window for the next round:
never-checked + stale-flagged queries first, the rest filled
oldest-vintage-first.  A query's implementing code is its own
function body in ``__spark_entry__.py`` plus the transitive closure
of the ``wrangle_pypes_spark`` modules that body imports (package-
internal imports followed one module at a time).  The code state a
round's check saw is approximated as the PARENT of the commit that
added its CORRECTNESS file (the driver commits results at the start
of the next round, so the parent is the round's final build state).

Pure file/git inspection — no Spark session; safe to run any time.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

WINDOW_SIZE = 50
_PKG = "wrangle_pypes_spark"
_IMPORT_RE = re.compile(
    r"(?:from|import)\s+(\.*)((?:[a-z_][a-z_0-9]*)(?:\.[a-z_][a-z_0-9]*)*)?"
    r"(?:\s+import\s+(?:\(([^)]*)\)|([^\n]+)))?")


def _git(repo: str, *args: str) -> str:
    return subprocess.run(["git", "-C", repo, *args],
                          capture_output=True, text=True).stdout


def _latest_statuses(repo: str, oracles: set[str]) -> dict:
    latest: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, rec in data.items():
            if rec.get("err") == "no_oracle":
                status = ("rows-only-ran" if rec.get("spark_rows")
                          is not None else "err")
            elif rec.get("err"):
                status = "err"
            elif rec.get("hash_match"):
                status = "hash-green"
            elif rec.get("rows_match") and name not in oracles:
                status = "rows-only-green"
            elif rec.get("rows_match"):
                status = "rows-green"
            else:
                status = "FAIL"
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, status)
    return latest


def _round_base_commit(repo: str, rnd: int):
    """The code state round ``rnd``'s driver check saw: the parent of
    the commit that added CORRECTNESS_r{rnd}.json."""
    out = _git(repo, "log", "--diff-filter=A", "--format=%H", "--",
               f"CORRECTNESS_r{rnd:02d}.json").split()
    if not out:
        return None
    parent = _git(repo, "rev-parse", f"{out[-1]}^").strip()
    return parent or None


def _dotted_to_files(repo: str, dotted: str) -> set[str]:
    """A package-absolute dotted path ('operators.dedup', 'operators',
    '') to the repo-relative file(s) it denotes: the module file, or a
    package's __init__.py."""
    out = set()
    base = _PKG + ("/" + dotted.replace(".", "/") if dotted else "")
    if os.path.exists(os.path.join(repo, base + ".py")):
        out.add(base + ".py")
    elif os.path.exists(os.path.join(repo, base, "__init__.py")):
        out.add(base + "/__init__.py")
    return out


def _pkg_imports(repo: str, text: str, at_file: str | None) -> set[str]:
    """Repo-relative files imported by ``text``, resolving relative
    imports against the package that contains ``at_file`` (None = the
    repo root, e.g. __spark_entry__.py / a query function's source).
    ``from pkg.sub import name`` also tries ``pkg.sub.name`` since the
    imported name may itself be a module."""
    files: set[str] = set()
    if at_file is None:
        pkg_parts: list[str] = []  # only absolute imports can resolve
    else:
        # package of the containing file, relative to _PKG
        parts = at_file.split("/")[1:-1]  # drop _PKG prefix + filename
        pkg_parts = parts
    for m in _IMPORT_RE.finditer(text):
        dots, path = m.group(1), m.group(2) or ""
        names = m.group(3) if m.group(3) is not None else (m.group(4) or "")
        names = names.split("#", 1)[0]  # strip a trailing comment
        if dots:
            if at_file is None:
                continue
            # 1 dot = current package, each extra dot = one parent up
            up = len(dots) - 1
            if up > len(pkg_parts):
                continue
            base_parts = pkg_parts[:len(pkg_parts) - up]
            dotted = ".".join(base_parts + ([path] if path else []))
        else:
            if path == _PKG:
                dotted = ""
            elif path.startswith(_PKG + "."):
                dotted = path[len(_PKG) + 1:]
            else:
                continue  # stdlib / third-party
        files |= _dotted_to_files(repo, dotted)
        for n in [x.strip() for x in names.split(",") if x.strip()]:
            files |= _dotted_to_files(
                repo, (dotted + "." + n).strip("."))
    return files


def _seed_files(repo: str, fn, src_now: str, entry_mod) -> set[str]:
    """The package files a query function DIRECTLY depends on: its
    in-body imports, plus the defining module of every module-level
    global it references (queries routinely call operators imported at
    the top of __spark_entry__.py, invisible to a source-text scan of
    the function alone)."""
    files = _pkg_imports(repo, src_now, None)
    for name in fn.__code__.co_names:
        obj = getattr(entry_mod, name, None)
        if obj is None:
            continue
        mod = inspect.getmodule(obj)
        f = getattr(mod, "__file__", None)
        if f and os.sep + _PKG + os.sep in f:
            files.add(os.path.relpath(f, repo))
    return files


def _closure_files(repo: str, seed_files: set[str],
                   max_depth: int = 2) -> set[str]:
    """Package-internal import closure, as repo-relative file paths,
    starting from a set of directly-imported files.

    Depth is capped (default 2: the modules the query imports, plus
    THEIR imports) — beyond that, transitive edges through utility
    modules flag nearly every query for any storage-layer change,
    drowning the signal.  ``__init__.py`` hops are free: a symbol
    imported through a package re-export is semantically a direct
    import of its defining module."""
    seen: set[str] = set()
    frontier = [(f, 1) for f in seed_files]
    while frontier:
        f, depth = frontier.pop()
        if f in seen:
            continue
        seen.add(f)
        is_init = f.endswith("/__init__.py")
        if depth >= max_depth and not is_init:
            continue
        try:
            text = open(os.path.join(repo, f)).read()
        except OSError:
            continue
        nxt = depth if is_init else depth + 1
        frontier.extend((g, nxt) for g in
                        _pkg_imports(repo, text, f) - seen)
    return seen


def _fn_source(entry_text: str, fn_name: str):
    """Extract one top-level ``def fn_name`` block from a file's text
    (used on OLD revisions where the module can't be imported)."""
    m = re.search(rf"^def {re.escape(fn_name)}\(.*?(?=^def |^SQL_|^_QUERIES)",
                  entry_text, re.S | re.M)
    return m.group(0) if m else None


def _stale_analysis(repo: str, qs: dict, latest: dict):
    """Queries whose implementing code changed after their last driver
    check.  Returns (stale: dict name -> reason, unknown: list)."""
    import __spark_entry__ as entry

    entry_now = open(os.path.join(repo, "__spark_entry__.py")).read()
    rounds = sorted({rnd for rnd, _ in latest.values()})
    base_commit = {r: _round_base_commit(repo, r) for r in rounds}
    old_entry_cache: dict[str, str] = {}
    changed_cache: dict[tuple[str, str], bool] = {}

    def _file_changed_since(commit: str, rel: str) -> bool:
        key = (commit, rel)
        if key not in changed_cache:
            diff = _git(repo, "diff", "--name-only", commit, "HEAD",
                        "--", rel)
            changed_cache[key] = bool(diff.strip())
        return changed_cache[key]

    stale: dict[str, str] = {}
    unknown: list[str] = []
    for name in qs:
        if name not in latest:
            continue  # never checked — reported separately
        rnd = latest[name][0]
        commit = base_commit.get(rnd)
        if commit is None:
            unknown.append(name)
            continue
        fn = qs[name]
        try:
            src_now = inspect.getsource(fn)
        except OSError:
            unknown.append(name)
            continue
        # (1) the query's own function body
        if commit not in old_entry_cache:
            old_entry_cache[commit] = _git(
                repo, "show", f"{commit}:__spark_entry__.py")
        old_src = _fn_source(old_entry_cache[commit], fn.__name__)
        new_src = _fn_source(entry_now, fn.__name__)
        if old_src != new_src:
            stale[name] = "entry-fn"
            continue
        # (2) the transitive module closure of what the body imports.
        # Package __init__ files are traversed (they re-export the
        # real modules) but never COUNT as implementing code — an
        # export-list touch would otherwise flag every query in the
        # package, drowning the signal the hand-curated lists had.
        for rel in sorted(_closure_files(
                repo, _seed_files(repo, fn, src_now, entry))):
            if rel.endswith("/__init__.py"):
                continue
            if _file_changed_since(commit, rel):
                stale[name] = rel
                break
    return stale, unknown


def main() -> int:
    args = [a for a in sys.argv[1:]]
    want_stale = "--stale" in args
    want_census = "--census" in args
    args = [a for a in args if a not in ("--stale", "--census")]
    repo = args[0] if args else \
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    oracles = set(entry.oracle_sql())
    window = set(names[:WINDOW_SIZE])

    if want_census:
        # the SURVEY census paragraph, generated from the registry so
        # the load-bearing counts can never go stale again (VERDICT
        # r8 #5): paste the output over the "registered queries"
        # sentence in SURVEY.md
        n_total = len(names)
        n_val = sum(1 for n in names if n in oracles)
        rows_only = [n for n in names if n not in oracles]
        print(f"{n_total} registered queries; {n_val} with value-level "
              f"oracles (the {len(rows_only)} rows-only ones:")
        for n in rows_only:
            print(f"  {n}")
        print(")")
        return 0

    latest = _latest_statuses(repo, oracles)

    counts: dict[str, int] = {}
    never = []
    print(f"{'query':<34} {'last':>4}  status      window  oracle")
    for name in names:
        rnd, status = latest.get(name, (0, "NEVER-CHECKED"))
        counts[status] = counts.get(status, 0) + 1
        if status == "NEVER-CHECKED":
            never.append(name)
        print(f"{name:<34} {('r%d' % rnd) if rnd else '-':>4}  "
              f"{status:<11} {'*' if name in window else '':^6}  "
              f"{'value' if name in oracles else 'rows'}")
    print()
    print("summary:", ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    nv = [n for n in never if n in oracles]
    print(f"never driver-checked: {len(never)} "
          f"({len(nv)} with value oracles)")
    in_window = [n for n in never if n in window]
    print(f"  of those, in the CURRENT window: {len(in_window)}")
    out_window = [n for n in never if n not in window]
    if out_window:
        print("  NOT covered by the current window:", ", ".join(out_window))

    if want_stale:
        print()
        stale, unknown = _stale_analysis(repo, qs, latest)
        print(f"stale-green (code changed after last driver check): "
              f"{len(stale)}")
        for name in names:
            if name in stale:
                rnd = latest[name][0]
                print(f"  {name:<34} last r{rnd}  via {stale[name]}")
        if unknown:
            print(f"  (history unavailable for {len(unknown)}: "
                  + ", ".join(unknown[:8])
                  + (" …" if len(unknown) > 8 else "") + ")")
        # the mechanically-derived next window: never-checked first,
        # then stale (oldest last-check first), then oldest-vintage
        # greens to fill
        lead = never + sorted(stale, key=lambda n: latest[n][0])
        rest = sorted((n for n in names
                       if n not in set(lead)),
                      key=lambda n: latest.get(n, (0, ""))[0])
        proposed = (lead + rest)[:WINDOW_SIZE]
        print()
        print(f"proposed next window ({WINDOW_SIZE}):")
        for i, n in enumerate(proposed):
            tag = ("NEVER" if n in set(never)
                   else f"stale:{stale[n]}" if n in stale
                   else f"r{latest[n][0]}-{latest[n][1]}")
            print(f"  {i+1:>2}. {n:<34} {tag}")
        covered = set(proposed) - window
        if covered:
            print(f"  ({len(covered)} of these are NOT in the current "
                  "window — rotate before the round ends)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
