"""S3: object-store listing / presign / delete — the reference
connector's operational contract against an injected client.

The reference wraps the AWS SDK in an ``S3Bucket`` class
(``app/bundles/custom/aws/s3/s3-connector.ts``): ``put`` / ``del`` /
``resourceExists`` (HeadObject) / ``getPresignedUrl`` (exists-gated,
default 3600 s expiry, ``:138-156``) / ``getPublicUrl`` (bucket URL
template, ``:178-184``) / ``list`` (ListObjectsV2; Prefix+Delimiter are
sent only when BOTH are given, and CommonPrefixes is returned when
present, else Contents, ``:186-216``) / ``readResource`` (exists-gated
line reader that flushes the callback every ``batchSize=25`` lines plus
a remainder flush, CRLF and LF both recognized, ``:219-256``).

Spark-first split, mirroring the S4 DynamoDB and S9 Sheets transports:
the BULK data path never goes through this class — JSON-lines objects
are read by ``operators/etl.py::read_jsonl`` (``spark.read.json`` over
the store URI, distributed, predicate-pushdown-capable) and written by
``df.write``. What this class reproduces is the per-object OPERATIONAL
contract (catalog listing, lifecycle, URL handoff) against an injected
``client`` so the call semantics are testable without a network:
``MemoryObjectClient`` implements the documented public ListObjectsV2
grouping rules (prefix filter, delimiter rollup into common prefixes,
UTF-8 key order) as the in-memory stand-in for the real service.
"""

from __future__ import annotations

from collections.abc import Callable


class MemoryObjectClient:
    """In-memory stand-in for the object-store service: a key->bytes dict
    plus the DOCUMENTED public ListObjectsV2 semantics (lexicographic key
    order; with a delimiter, keys containing it after the prefix roll up
    into CommonPrefixes — prefix up to and including the first delimiter
    occurrence — and only the rest are listed in Contents). Every call
    appends to ``calls`` so tests can assert the exact call sequence."""

    def __init__(self) -> None:
        self.objects: dict[str, bytes] = {}
        self.calls: list[tuple] = []

    def put_object(self, key: str, body: bytes) -> None:
        self.calls.append(("put_object", key))
        self.objects[key] = bytes(body)

    def delete_object(self, key: str) -> None:
        # real DeleteObject is idempotent: deleting a missing key succeeds
        self.calls.append(("delete_object", key))
        self.objects.pop(key, None)

    def head_object(self, key: str) -> dict:
        self.calls.append(("head_object", key))
        if key not in self.objects:
            raise KeyError(key)
        return {"ContentLength": len(self.objects[key])}

    def get_object(self, key: str) -> bytes:
        self.calls.append(("get_object", key))
        return self.objects[key]

    def presign_get(self, bucket: str, key: str, expires_in: int) -> str:
        self.calls.append(("presign_get", key, expires_in))
        return (f"https://{bucket}.s3.amazonaws.com/{key}"
                f"?X-Amz-Expires={expires_in}&X-Amz-Signature=stub")

    def list_objects_v2(self, prefix: str | None = None,
                        delimiter: str | None = None) -> dict:
        self.calls.append(("list_objects_v2", prefix, delimiter))
        pre = prefix or ""
        keys = sorted(k for k in self.objects if k.startswith(pre))
        if not delimiter:
            return {"Contents": [{"Key": k} for k in keys],
                    "CommonPrefixes": []}
        contents, commons, seen = [], [], set()
        for k in keys:
            rest = k[len(pre):]
            cut = rest.find(delimiter)
            if cut == -1:
                contents.append({"Key": k})
            else:
                cp = pre + rest[:cut + len(delimiter)]
                if cp not in seen:
                    seen.add(cp)
                    commons.append({"Prefix": cp})
        return {"Contents": contents, "CommonPrefixes": commons}


class S3ObjectStore:
    """The reference ``S3Bucket`` surface over an injected client
    (``s3-connector.ts:33-257``). Reproduced behaviors, not improved:

    - ``presigned_url`` HeadObject-gates first and raises
      ``Resource does not exist`` on a miss (``:141-144``), then asks
      for a signed GET with the given expiry (default 3600 s).
    - ``list`` sends Prefix+Delimiter only when BOTH are given — the
      reference's exact quirk (``:195-203``) — and returns the
      CommonPrefixes list when it is non-empty, else Contents.
    - ``read_resource`` exists-gates, then streams lines to ``cb`` in
      batches of ``batch_size`` (default 25) with a remainder flush;
      both CRLF and LF terminate lines (``crlfDelay: Infinity``).
    """

    def __init__(self, client, bucket: str) -> None:
        self.client = client
        self.bucket = bucket

    def put(self, filename: str, content: bytes | str) -> None:
        body = content.encode("utf-8") if isinstance(content, str) \
            else bytes(content)
        self.client.put_object(filename, body)

    def delete(self, filename: str) -> None:
        self.client.delete_object(filename)

    def resource_exists(self, filename: str) -> bool:
        try:
            self.client.head_object(filename)
            return True
        except KeyError:
            return False

    def presigned_url(self, filename: str, expiration: int = 3600) -> str:
        if not self.resource_exists(filename):
            raise ValueError("Resource does not exist")
        return self.client.presign_get(self.bucket, filename, expiration)

    def public_url(self, filename: str) -> str:
        return f"https://{self.bucket}.s3.amazonaws.com/{filename}"

    def list(self, prefix: str | None = None,
             delimiter: str | None = None) -> list:
        if prefix and delimiter:
            data = self.client.list_objects_v2(prefix=prefix,
                                               delimiter=delimiter)
        else:
            data = self.client.list_objects_v2()
        if data.get("CommonPrefixes"):
            return data["CommonPrefixes"]
        return data.get("Contents", [])

    def read_resource(self, filename: str,
                      cb: Callable[[list[str]], None],
                      batch_size: int = 25) -> None:
        if not self.resource_exists(filename):
            raise ValueError("Resource does not exist")
        text = self.client.get_object(filename).decode("utf-8")
        # readline with crlfDelay=Infinity: CRLF counts as ONE break, and
        # a LONE \r is also a break (Node readline's terminator set is
        # \r\n, \n, \r); a trailing terminator does not emit a final
        # empty line
        lines = (text.replace("\r\n", "\n").replace("\r", "\n")
                 .split("\n"))
        if lines and lines[-1] == "":
            lines.pop()
        batch: list[str] = []
        for line in lines:
            batch.append(line)
            if len(batch) == batch_size:
                cb(batch)
                batch = []
        if batch:
            cb(batch)
