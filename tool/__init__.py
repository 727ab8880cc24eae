"""Reference-compatible tooling namespace (`from tool import ...`)."""
