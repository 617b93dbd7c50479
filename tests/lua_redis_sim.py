"""Back-compat shim: the Lua EVAL emulator moved into the package
(``steaminganalysis_spark.backends.luasim``) in round 5 so the
mini-Redis RESP server can execute EVAL with it. Tests keep their
historical import path."""

from steaminganalysis_spark.backends.luasim import (  # noqa: F401
    LuaKVStore,
    LuaScriptRunner,
)
