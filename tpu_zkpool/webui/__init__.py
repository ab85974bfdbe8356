"""Browser demo UI (C26) — the framework's analogue of the reference's
Next.js frontend (``demo-frontend/app/components/shielded-pool-card.tsx``,
``page.tsx``; SURVEY.md §1 L6).

A stdlib ``http.server`` app serving a single-page UI plus the JSON API the
reference splits between its UI card and relayer routes: deposit (identity
keygen + RLWE encryption inline), relayed withdraw (audit-then-withdraw two
transactions), root-age/status display, audit history, and auditor Shamir
decryption. State persists through the C23 storage module.

Run: ``python -m tpu_zkpool.webui [--port 8642]``
"""

from tpu_zkpool.webui.app import DemoApp
from tpu_zkpool.webui.server import make_server, serve

__all__ = ["DemoApp", "make_server", "serve"]
