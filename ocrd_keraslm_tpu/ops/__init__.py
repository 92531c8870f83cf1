from .lstm_cell import lstm_scan_pallas

__all__ = ['lstm_scan_pallas']
