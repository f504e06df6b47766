"""Alias of `ssdseglib_tpu.blocks` under the reference module name.

The reference notebooks address this module as `ssdseglib.blocks`
(reference ssdseglib/__init__.py:1-9); every implementation lives in
`ssdseglib_tpu.blocks` — this file only mirrors its namespace.
"""

import ssdseglib_tpu.blocks as _impl

globals().update(
    {k: v for k, v in vars(_impl).items() if not k.startswith("__")}
)
del _impl
