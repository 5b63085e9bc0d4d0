from .apply import apply_changes, compact_latest, merge_upsert  # noqa: F401
from .envelope import ENVELOPE_SCHEMA, decode_envelope, encode_envelope  # noqa: F401
