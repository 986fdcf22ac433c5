from .catalog import (  # noqa: F401
    EXTRAS,
    REGISTRY,
    QuerySpec,
    query,
    release_persisted,
    track_persist,
)

# Importing these modules populates REGISTRY via the @query decorator.
from . import relational  # noqa: F401,E402
from . import streampro  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import pipeline_q  # noqa: F401,E402
from . import dedup_ann  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import setops  # noqa: F401,E402
from . import tpch_q  # noqa: F401,E402
from . import reshape  # noqa: F401,E402
from . import corpus_ops  # noqa: F401,E402
