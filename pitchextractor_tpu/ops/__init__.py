from .lstm_pallas import lstm_layer_pallas, pallas_lstm_available

__all__ = ["lstm_layer_pallas", "pallas_lstm_available"]
