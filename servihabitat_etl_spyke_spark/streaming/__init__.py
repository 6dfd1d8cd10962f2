"""Streaming layer (SURVEY.md §2.8): topic pub/sub with MQTT wildcards,
event-stream source with CDC notifications, stateful operators
(edge detection, state machines), queues, and watermarked windows.

The reference implements these as a single-process MQTT broker + in-memory
callbacks; here every operator is a Structured Streaming construct (or a
batch twin of one) so the same code scales from local[32] to a cluster.
"""

from .topics import mqtt_to_regex, topic_filter, subscribe  # noqa: F401
from .events import (  # noqa: F401
    read_event_stream, with_generated, route_envs, split_ephemeral,
    cdc_topics,
)
from .stateful import (  # noqa: F401
    StateMachine, edge_detect_stream, state_machine_fold,
    state_machine_stream,
)
from .queues import drain_order  # noqa: F401
from .windows import (  # noqa: F401
    tumbling_counts_stream, sliding_counts, session_window_agg,
)
