"""Live-trading execution: orders, algos, routing, broker, safety, TCA."""

from . import algorithms, broker, emergency, order, order_manager, reconciliation, routing, tca  # noqa: F401
from .broker import SimulatedBroker  # noqa: F401
from .emergency import KillSwitch  # noqa: F401
from .order import Fill, Order, OrderSide, OrderStatus, OrderType  # noqa: F401
from .order_manager import OrderManager  # noqa: F401
