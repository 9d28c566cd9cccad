"""Path / object-key scalar functions (SURVEY.md §2.6 F1-F5).

The reference derives a Swift object key from a filesystem path in two steps
(bulkupload.py:48-56): truncate everything up to and including a user-supplied
"path cutoff" component, then drop a leading slash. Both reference
implementations are defective (``str.lstrip`` strips a *character set*, not a
prefix, bulkupload.py:50-51; the slash branch only fires on the literal path
``"/"``, :53-56); per SURVEY.md §7.4 items 1-2 we implement the documented
intent (readme.md:58-67) and record the divergence.

Everything here is a pure Column expression — no Python UDFs — so the key
derivation runs inside whole-stage codegen at any scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_cutoff(path: Column, cutoff: str) -> Column:
    """F1 — truncate a path through the first occurrence of the ``cutoff``
    component (documented intent of bulkupload.py:50-51 per readme.md:58-67).

    ``/Users/John/Doe/assets/x`` with cutoff ``Doe`` -> ``assets/x``.
    Paths not containing the component are returned unchanged (minus nothing).
    An empty cutoff is the identity, matching ``lstrip("")``.
    """
    if not cutoff:
        return path
    pattern = "^.*?" + re.escape(cutoff) + "/"
    return F.regexp_replace(path, pattern, "")


def strip_leading_slash(path: Column) -> Column:
    """F2 — drop one leading ``/`` so object keys don't start with an empty
    component (documented intent of bulkupload.py:53-56)."""
    return F.regexp_replace(path, "^/", "")


def object_key(path: Column, cutoff: str = "") -> Column:
    """Full key derivation used by the upload stage (bulkupload.py:48-56):
    cutoff truncation then leading-slash strip."""
    return strip_leading_slash(path_cutoff(path, cutoff))


def path_join(directory: Column, name: Column) -> Column:
    """F3 — ``os.path.join`` for POSIX paths (prepareupload.py:32).

    Mirrors os.path.join's absolute-override: if ``name`` starts with ``/``
    it replaces ``directory`` entirely; otherwise join with exactly one slash.
    """
    return F.when(name.startswith("/"), name).otherwise(
        F.concat(F.regexp_replace(directory, "/$", ""), F.lit("/"), name)
    )


def path_basename(path: Column) -> Column:
    """F4 — last path component, ``path.split('/')[-1]`` (filesegmenter.py:14)."""
    return F.element_at(F.split(path, "/"), -1)


def segment_name(base: Column, seg_no: Column) -> Column:
    """F5 — zero-padded segment file name ``{base}-%04d.txt``
    (filesegmenter.py:32-35)."""
    return F.format_string("%s-%04d.txt", base, seg_no)
