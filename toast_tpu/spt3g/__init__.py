"""SPT3G interoperability: Observation <-> G3 frame conversion.

Mirrors ``ref:src/toast/spt3g/``.  The conversion logic is complete and
package-independent: with the real ``spt3g`` installed it drives
``spt3g.core`` objects; without it a faithful shim provides the same
class surface (see :mod:`g3shim`).
"""

from .g3shim import available, get_g3
from .spt3g_export import (
    export_obs,
    export_obs_data,
    export_obs_meta,
)
from .spt3g_import import (
    import_obs,
    import_obs_data,
    import_obs_meta,
)
