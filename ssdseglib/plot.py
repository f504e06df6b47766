"""Alias of `ssdseglib_tpu.plot` under the reference module name.

The reference notebooks address this module as `ssdseglib.plot`
(reference ssdseglib/__init__.py:1-9); every implementation lives in
`ssdseglib_tpu.plot` — this file only mirrors its namespace.
"""

import ssdseglib_tpu.plot as _impl

globals().update(
    {k: v for k, v in vars(_impl).items() if not k.startswith("__")}
)
del _impl
