"""Image-table source.

The driver's input shape is a Lance table of image+caption pairs; the
``lance`` package is not installable here (SURVEY.md §7.0), so storage
is identical-schema parquet behind this one switch point — swap
``ray.data.read_lance`` in when the dependency exists.  Column pruning
is pushed to the read: pipelines that don't touch pixels never load the
``bytes`` column off storage.
"""

from __future__ import annotations

import ray.data


def read_images(
    path,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """Read the image table (a path, directory, or list of files).
    ``columns`` prunes at the parquet reader (a read that loads all
    columns for a narrow transform is wrong at 100 TB);
    ``override_num_blocks`` keeps small synthetic inputs from collapsing
    into too few blocks to parallelize."""
    if isinstance(path, str) and hasattr(ray.data, "read_lance") and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns)
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns, **kwargs)
