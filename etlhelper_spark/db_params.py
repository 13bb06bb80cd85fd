"""Connection-parameter object.

Same capability surface as the reference DbParams
(reference: etlhelper/db_params.py:20-179): a dict subclass with
attribute access, per-dbtype required-parameter validation (extras
rejected), construction from environment variables, a TCP
reachability probe, and copy(). Instead of producing a DB-API
connection it renders a JDBC URL + properties map that Spark's JDBC
source/sink consumes, plus SQLAlchemy-style URLs for interop.
"""

from __future__ import annotations

import os
import socket
from typing import Any

from .dialects import DIALECT_REGISTRY
from .exceptions import ETLHelperDbParamsError


class DbParams(dict):
    """Generic connection parameters with attribute access and
    per-dbtype validation."""

    def __init__(self, dbtype: str = "dbtype not set", **kwargs: Any) -> None:
        kwargs.update(dbtype=dbtype.upper())
        super().__init__(kwargs)
        self.validate_params()

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(f"No such attribute: {name}") from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    # -- validation ---------------------------------------------------
    def validate_params(self) -> None:
        """Check dbtype is supported and params exactly match the
        dialect's required set (reference: db_params.py:54-83)."""
        dbtype = self.get("dbtype", "dbtype not set")
        try:
            dialect = DIALECT_REGISTRY[dbtype]
        except KeyError:
            msg = f"{dbtype} not recognised database type"
            raise ETLHelperDbParamsError(msg) from None

        required = dialect.required_params
        given = set(self.keys()) - {"dbtype"}
        unset = required - given
        if unset:
            raise ETLHelperDbParamsError(f"{unset} not set for {dbtype}")
        extras = given - required - dialect.optional_params
        if extras:
            raise ETLHelperDbParamsError(f"Invalid parameter(s): {extras}")

    # -- construction -------------------------------------------------
    @classmethod
    def from_environment(cls, prefix: str = "ETLHelper_") -> "DbParams":
        """Build DbParams from environment variables with *prefix*
        (reference: db_params.py:85-108)."""
        dbparams_keys = [k for k in os.environ if k.startswith(prefix)]
        dbparams = {
            key.replace(prefix, "").lower(): os.environ[key]
            for key in dbparams_keys
        }
        if "dbtype" not in dbparams:
            raise ETLHelperDbParamsError(
                f"{prefix}dbtype environment variable is not set"
            )
        return cls(**dbparams)

    def copy(self) -> "DbParams":
        kwargs = dict(self)
        dbtype = kwargs.pop("dbtype")
        return DbParams(dbtype=dbtype, **kwargs)

    # -- connectivity --------------------------------------------------
    def is_reachable(self, timeout: int = 5) -> bool:
        """5-second TCP probe of host:port
        (reference: db_params.py:110-131)."""
        if self.dialect.passwordless:
            raise ValueError(
                f"{self.dbtype} DbParams are file-backed: no host to probe"
            )
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.settimeout(timeout)
        try:
            s.connect((self["host"], int(self["port"])))
            return True
        except OSError:
            return False
        finally:
            s.close()

    # -- rendering ------------------------------------------------------
    @property
    def dialect(self):
        return DIALECT_REGISTRY[self["dbtype"]]

    @property
    def paramstyle(self) -> str:
        return self.dialect.paramstyle

    def get_password(self, password_variable: str | None = None) -> str:
        """Passwords only ever come from environment variables
        (reference: db_helpers/db_helper.py:75-92)."""
        variable = password_variable or self.get("password_variable")
        if not variable:
            raise ETLHelperDbParamsError(
                "Name of password environment variable e.g. ORACLE_PASSWORD "
                "is required"
            )
        try:
            return os.environ[variable]
        except KeyError:
            raise ETLHelperDbParamsError(
                f"Password environment variable ({variable}) is not set"
            ) from None

    def jdbc_url(self) -> str:
        return self.dialect.jdbc_url(self)

    def jdbc_properties(
        self, password_variable: str | None = None, **kwargs: str
    ) -> dict[str, str]:
        """Options dict for spark.read/write.format('jdbc')."""
        props = self.dialect.jdbc_properties(self)
        if not self.dialect.passwordless:
            props["user"] = self.get("user", "")
            props["password"] = self.get_password(password_variable)
        props.update(kwargs)
        return props

    def get_connection_string(self, password_variable: str | None = None) -> str:
        """Native driver connection string (reference: connect.py:22-30)."""
        return self.dialect.connection_string(
            self, self.get_password(password_variable)
            if not self.dialect.passwordless else ""
        )

    def get_sqlalchemy_connection_string(
        self, password_variable: str | None = None
    ) -> str:
        """SQLAlchemy URL (reference: connect.py:33-43)."""
        return self.dialect.sqlalchemy_url(
            self, self.get_password(password_variable)
            if not self.dialect.passwordless else ""
        )

    def __repr__(self) -> str:
        key_val_str = ", ".join(
            f"{key}='{self[key]}'" for key in sorted(self.keys()) if key != "dbtype"
        )
        return f"DbParams(dbtype='{self['dbtype']}', {key_val_str})"

    def __str__(self) -> str:
        return self.__repr__()
