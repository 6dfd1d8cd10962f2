"""T1 transport: the reference's embedded MQTT broker wiring as a
testable contract.

The reference starts TWO aedes broker instances, each listening on an
MQTT TCP port and a companion WebSocket port — (1883, 3003) and
(8883, 4003) — and installs one ``authenticate`` hook
(``apps/admin-api/src/mqtt.ts:8-52``). The hook's decision table, which
this module reproduces exactly (including its documented gap):

- auth DISABLED  -> every connection is accepted (anonymous logged);
- auth ENABLED   -> a connection with no username or no password is
  REFUSED ("mqtt requires auth");
- auth ENABLED + both supplied -> ACCEPTED WITHOUT VALIDATION — the
  reference's credential check is a literal ``//TODO: auth``
  (``mqtt.ts:25-27``), so any username/password pair passes. Faithful
  reproduction, flagged here so nobody mistakes it for security.

The MQTT wire protocol itself came from the aedes library in the
reference and is out of scope here (no broker library, no sockets in
this sandbox); what remains — the authenticate gate, the dual-listener
config shape, and topic routing — is reproduced with routing delegated
to the same ``+``/``#`` matcher the Spark subscriptions compile to
(:mod:`.topics`), so an in-process client and a DataFrame subscription
can never disagree on which topics a filter matches.
"""

from __future__ import annotations

import re

from .topics import mqtt_to_regex

#: the reference's two listener pairs: (mqtt_port, websocket_port)
LISTENER_PAIRS = ((1883, 3003), (8883, 4003))


class MqttAuthError(Exception):
    """Connection refused by the authenticate hook."""


class BrokerSim:
    """One aedes-instance stand-in: authenticate gate + wildcard-routed
    pub/sub. Subscribers accumulate matched messages in per-client
    queues (``drain`` empties one)."""

    def __init__(self, auth_required: bool = False,
                 mqtt_port: int = 1883, websocket_port: int = 3003):
        self.auth_required = auth_required
        self.mqtt_port = mqtt_port
        self.websocket_port = websocket_port
        self._subs: dict[str, list[re.Pattern]] = {}
        self._queues: dict[str, list[tuple[str, object]]] = {}
        self.log: list[str] = []

    # -- the mqtt.ts:15-31 decision table, verbatim ---------------------
    def authenticate(self, username: str | None,
                     password: str | None) -> bool:
        if not username:
            self.log.append("MQTT anonymous login request")
        else:
            self.log.append(f"MQTT user login request: {username}")
        if self.auth_required:
            if not username or not password:
                self.log.append(
                    "MQTT anonymous login refused: mqtt requires auth")
                return False
            # reference: //TODO: auth — any supplied pair is accepted
            return True
        return True

    def connect(self, client_id: str, username: str | None = None,
                password: str | None = None) -> None:
        if not self.authenticate(username, password):
            raise MqttAuthError("mqtt requires auth")
        self._subs.setdefault(client_id, [])
        self._queues.setdefault(client_id, [])

    def subscribe(self, client_id: str, pattern: str) -> None:
        if client_id not in self._subs:
            raise KeyError(f"client not connected: {client_id}")
        self._subs[client_id].append(re.compile(mqtt_to_regex(pattern)))

    def publish(self, topic: str, payload) -> int:
        """Route to every matching SUBSCRIPTION (aedes delivers once per
        matching subscription, not once per client — a client holding
        overlapping filters like ``sensors/#`` + ``sensors/+/temp``
        receives the message once per filter, exactly as N independent
        DataFrame ``topic_filter`` subscriptions would); returns the
        delivery count."""
        n = 0
        for cid, pats in self._subs.items():
            for p in pats:
                if p.match(topic):
                    self._queues[cid].append((topic, payload))
                    n += 1
        return n

    def drain(self, client_id: str) -> list[tuple[str, object]]:
        out = self._queues.get(client_id, [])
        self._queues[client_id] = []
        return out


def start_mqtt(auth_required: bool = False) -> list[BrokerSim]:
    """``startMqtt``: one broker per listener pair (``mqtt.ts:8-11``)."""
    return [BrokerSim(auth_required, mqtt_port=m, websocket_port=w)
            for m, w in LISTENER_PAIRS]
