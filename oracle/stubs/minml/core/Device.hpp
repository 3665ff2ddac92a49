/* Minimal stub of minml's Device header for the parity oracle build: the
 * reference's utils/configs.hpp needs a complete ml::Device with a cpu()
 * factory for default member initializers; nothing device-related is ever
 * executed. */
#ifndef MINML_CORE_DEVICE_HPP_
#define MINML_CORE_DEVICE_HPP_

#include <string>

namespace ml
{
	class Device
	{
		public:
			static Device cpu() noexcept
			{
				return Device();
			}
			static Device cuda(int) noexcept
			{
				return Device();
			}
			static Device opencl(int) noexcept
			{
				return Device();
			}
			bool isCPU() const noexcept
			{
				return true;
			}
			bool isCUDA() const noexcept
			{
				return false;
			}
			bool isOPENCL() const noexcept
			{
				return false;
			}
			bool operator==(const Device &) const noexcept
			{
				return true;
			}
			bool operator!=(const Device &) const noexcept
			{
				return false;
			}
			std::string toString() const
			{
				return "CPU";
			}
	};
} /* namespace ml */

#endif
