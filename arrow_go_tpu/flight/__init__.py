"""Arrow Flight RPC (reference arrow/flight, SURVEY.md §2e)."""
from . import Flight_pb2  # noqa: F401
from .service import (Action, FlightClient, FlightDataReader,  # noqa: F401
                      FlightDescriptor, FlightEndpoint, FlightInfo,
                      FlightServerBase, Result, Ticket,
                      batches_to_flight_data)
from . import FlightSql_pb2  # noqa: F401
from .sql import (FlightSQLClient, FlightSQLServerBase,  # noqa: F401
                  PreparedStatement, SQLiteFlightSQLServer, SqlInfo)
from .session import CookieMiddleware, Session, SessionManager  # noqa: F401
from . import dbapi  # noqa: F401  (PEP 249 driver, database/sql analog)
