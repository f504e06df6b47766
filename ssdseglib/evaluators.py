"""Alias of `ssdseglib_tpu.evaluators` under the reference module name.

The reference notebooks address this module as `ssdseglib.evaluators`
(reference ssdseglib/__init__.py:1-9); every implementation lives in
`ssdseglib_tpu.evaluators` — this file only mirrors its namespace.
"""

import ssdseglib_tpu.evaluators as _impl

globals().update(
    {k: v for k, v in vars(_impl).items() if not k.startswith("__")}
)
del _impl
