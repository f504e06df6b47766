"""Device-side ops: GT encoding/decoding, NMS, color augmentation.

These are the XLA/jnp replacements for the TF-builtin native ops the
reference leans on (SURVEY.md §2 last column): `tf.raw_ops.UniqueV2` +
`tensor_scatter_nd_update` matching (ops.encoding), `tf.image
.combined_non_max_suppression` (ops.nms), `tf.image.random_*` (ops.color).
"""

from ssdseglib_tpu.ops import encoding
from ssdseglib_tpu.ops import nms
from ssdseglib_tpu.ops import color

__all__ = ["encoding", "nms", "color"]
