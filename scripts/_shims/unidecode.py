"""ASCII-transliteration stub (the `unidecode` pypi package is absent; the
reference only calls it on log strings — an ASCII-dropping fallback keeps
behavior for ASCII input, which is all the exported datasets contain)."""


def unidecode(s: str) -> str:
    return s.encode("ascii", "ignore").decode("ascii")
