"""CLI apps: view (headless viewer), bake (asset baking), hello (minimal).

Parity targets: `crates/bin/view`, `crates/bin/bake`, `crates/bin/hello`.
"""
