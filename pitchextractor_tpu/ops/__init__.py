from .lstm_pallas import lstm_layer_pallas, bilstm_layer_pallas, multichain_lstm_pallas, pallas_lstm_available

__all__ = ["lstm_layer_pallas", "bilstm_layer_pallas", "multichain_lstm_pallas", "pallas_lstm_available"]
